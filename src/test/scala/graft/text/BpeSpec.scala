package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The Sennrich et al. worked example: {low:5, lower:2, newest:6, widest:3}.
  private lazy val classic = Seq(
    (0L, ("low " * 5).trim),
    (1L, ("lower " * 2).trim),
    (2L, ("newest " * 6).trim),
    (3L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  test("learns the textbook merge sequence on the classic corpus") {
    val model = Bpe.train(classic, nMerges = 3)
    // (e,s) ties (s,t) and (t,</w>) at 9 — lexicographic tie-break picks
    // (e,s); then (es,t) at 9; then (est,</w>) at 9.
    model.merges shouldBe Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow))
  }

  test("encode round-trips: concatenated tokens reconstruct the word") {
    val model = Bpe.train(classic, nMerges = 10)
    Seq("low", "lower", "newest", "widest", "lowest", "unseen").foreach { w =>
      val toks = Bpe.encodeWord(w, model.ranks)
      toks.mkString.stripSuffix(Bpe.Eow) shouldBe w
    }
  }

  test("subword generalization: 'lowest' reuses merges from 'low'+'est'") {
    val model = Bpe.train(classic, nMerges = 10)
    val toks = Bpe.encodeWord("lowest", model.ranks)
    // 'est</w>' was learned from newest/widest, 'low' from low/lower —
    // the unseen word tokenizes into known subwords, not characters.
    toks should contain("est" + Bpe.Eow)
    toks.length should be < "lowest".length + 1
  }

  test("training is deterministic and bounded by available pairs") {
    Bpe.train(classic, 10) shouldBe Bpe.train(classic, 10)
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    // "ab</w>" exhausts after 2 merges; asking for more must not loop.
    Bpe.train(tiny, 100).merges.length shouldBe 2
  }

  test("distributed train is bit-identical to the sampled trainer when the sample covers the corpus") {
    // the word-frequency table is BPE's sufficient statistic: same table
    // (full corpus both ways), same merge loop, same model
    Bpe.trainDistributed(classic, 10).merges shouldBe
      Bpe.train(classic, 10).merges
    Bpe.trainDistributed(classic, 10, maxWords = 0).merges shouldBe
      Bpe.train(classic, 10).merges
    // and on the real fixture corpus, repartitioned — partition layout
    // must not move the distributed word counts
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    Bpe.trainDistributed(docs, 40).merges shouldBe Bpe.train(docs, 40).merges
    Bpe.trainDistributed(docs.repartition(7), 40).merges shouldBe
      Bpe.trainDistributed(docs, 40).merges
  }

  test("maxWords caps the driver table by COUNT, deterministically (count desc, word asc)") {
    // top-1 word is 'newest' (6) — merges learned from it alone
    val m1 = Bpe.trainDistributed(classic, 10, maxWords = 1)
    m1.merges shouldBe Bpe.train(
      Seq((0L, "newest")).toDF("doc_id", "text"), 10).merges
    // a cap at the vocabulary size is the uncapped model
    Bpe.trainDistributed(classic, 10, maxWords = 4).merges shouldBe
      Bpe.trainDistributed(classic, 10, maxWords = 0).merges
  }

  test("tokenStats counts tokenizer tokens, not whitespace words") {
    val model = Bpe.train(classic, nMerges = 10)
    val stats = Bpe.tokenStats(classic, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    // doc 2 = "newest" ×6: with est</w> + n/e/w merges available the word
    // is ≤ 4 tokens, and every word tokenizes identically.
    val (nWords, bpe, perWord) = stats(2L)
    nWords shouldBe 6
    bpe % 6 shouldBe 0
    perWord shouldBe bpe.toDouble / 6
    // More merges never increase the token count.
    val coarse = Bpe.tokenStats(classic, Bpe.Model(Seq.empty)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    stats.foreach { case (id, (_, b, _)) => b should be <= coarse(id) }
  }

  test("zero merges tokenizes to characters + end-of-word") {
    Bpe.encodeWord("abc", Map.empty) shouldBe Vector("a", "b", "c", Bpe.Eow)
  }

  test("encode plan is shuffle-free") {
    val model = Bpe.train(classic, 5)
    Bpe.tokenStats(classic, model).queryExecution.executedPlan.toString should
      not include "Exchange"
  }

  test("token coverage: counts reconcile with tokenStats, curve is a valid CDF") {
    val model = Bpe.train(classic, 5)
    val cov = Bpe.tokenCoverage(classic, model)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._3)
    cov should not be empty
    // total token mass equals the per-doc accounting's sum
    val totalFromStats = Bpe.tokenStats(classic, model)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).head().getLong(0)
    cov.map(_._2).sum shouldBe totalFromStats
    // ranks are 1..k in descending-count order; shares sum to 1; the
    // cumulative share is monotone and ends at exactly 1.0
    cov.map(_._3) shouldBe (1L to cov.length.toLong)
    cov.sliding(2).foreach { case Array(a, b) =>
      a._2 should be >= b._2
      b._5 should be >= a._5
    }
    cov.map(_._4).sum shouldBe 1.0 +- 1e-9
    cov.last._5 shouldBe 1.0 +- 1e-12
    // every token is a realized encode output: concatenating the top
    // token's chars (minus the end-of-word marker) appears in the corpus
    val vocabOnly = cov.map(_._1).toSet
    vocabOnly.foreach { t => t.length should be > 0 }
  }
}
