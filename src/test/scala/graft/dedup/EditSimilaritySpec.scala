package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(ids: (Long, Long)*) = ids.toDF("doc_a", "doc_b")

  private def score(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)],
                    prefix: Int = 512, threshold: Double = 0.0) =
    EditSimilarity.scorePairs(docs.toDF("doc_id", "text"),
        pairsOf(pairs: _*), prefix = prefix, threshold = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap

  test("hand-computed distances: exact copy 1.0, one substitution 0.75") {
    val out = score(
      Seq((1L, "abcd"), (2L, "abcd"), (3L, "abed")),
      Seq((1L, 2L), (1L, 3L)))
    out((1L, 2L)) shouldBe ((0L, 4L, 1.0))
    out((1L, 3L)) shouldBe ((1L, 4L, 0.75))
  }

  test("order-aware: a word-reordered twin scores LOW where Jaccard scores 1.0") {
    val a = "alpha beta gamma delta"
    val b = "delta gamma beta alpha"
    val out = score(Seq((1L, a), (2L, b)), Seq((1L, 2L)))
    // identical word SET (char-gram/shingle Jaccard ≈ 1) but heavy edits
    out((1L, 2L))._3 should be < 0.5
  }

  test("prefix cap: documents identical up to the cap verify at 1.0 (the documented truncation)") {
    val out = score(Seq((1L, "abcdXYZ"), (2L, "abcdQQQ")),
      Seq((1L, 2L)), prefix = 4)
    out((1L, 2L)) shouldBe ((0L, 4L, 1.0))
  }

  test("two empty prefixes: null similarity (the /0 contract), filtered by any threshold") {
    val rows = EditSimilarity.scorePairs(
      Seq((1L, ""), (2L, "")).toDF("doc_id", "text"), pairsOf((1L, 2L)))
    rows.count() shouldBe 0L
    // and without the threshold filter the sim is NULL, never NaN
    val unfiltered = EditSimilarity.scorePairs(
        Seq((1L, ""), (2L, "")).toDF("doc_id", "text"), pairsOf((1L, 2L)),
        threshold = Double.NegativeInfinity)
    unfiltered.count() shouldBe 0L // null >= -inf is null → filtered
  }

  test("lowercasing: case-variant copies verify as exact") {
    val out = score(Seq((1L, "The Cat SAT"), (2L, "the cat sat")),
      Seq((1L, 2L)), threshold = 0.7)
    out((1L, 2L))._3 shouldBe 1.0
  }

  test("threshold keeps planted near-dups and drops unrelated candidates on the fixture corpus") {
    val docs = graft.queries.CorpusQueries.augmentedDocs(spark, sf("sf0.001"))
    val cands = MinHashLSH.candidatePairs(docs)
    val kept = EditSimilarity.scorePairs(docs, cands)
    kept.count() should be > 0L
    // every surviving pair really reaches the threshold, sim within [0, 1]
    kept.collect().foreach { r =>
      r.getDouble(4) should (be >= 0.7 and be <= 1.0)
    }
  }
}
