package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // hand-built model: explicit costs, no training involved
  private val hand = UnigramLm.Model(Seq(
    "a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
    "ab" -> 1.5, "abab" -> 2.5, "bc" -> 1.2))

  test("Viterbi picks the cheapest segmentation (hand-computed)") {
    // "abab": whole piece 2.5 beats ab+ab (3.0) and chars (4.0)
    UnigramLm.viterbiTokens("abab", hand) shouldBe 1
    // "ababab": abab+ab (4.0) beats ab+ab+ab (4.5) → 2 tokens
    UnigramLm.viterbiTokens("ababab", hand) shouldBe 2
    // "abc": a+bc (2.2) beats ab+c (2.5) → 2 tokens
    UnigramLm.viterbiTokens("abc", hand) shouldBe 2
    // single known char
    UnigramLm.viterbiTokens("c", hand) shouldBe 1
    UnigramLm.viterbiTokens("", hand) shouldBe 0
  }

  test("out-of-vocab chars fall back to the unk single-char path") {
    // x, y unknown → two unk char tokens; mixing with known pieces works
    UnigramLm.viterbiTokens("xy", hand) shouldBe 2
    UnigramLm.viterbiTokens("xabab", hand) shouldBe 2 // unk + abab
  }

  test("training makes a frequent word a single piece (fertility → 1)") {
    val docs = (0L until 60L)
      .map(i => (i, "customer order " * 4))
      .toDF("doc_id", "text")
    val m = UnigramLm.train(docs, vocabSize = 40)
    UnigramLm.viterbiTokens("customer", m) shouldBe 1
    UnigramLm.viterbiTokens("order", m) shouldBe 1
    // every piece cost is finite and positive (p strictly inside (0, 1])
    m.pieces.foreach { case (_, c) => c should be >= 0.0 }
    // token accounting: 8 words per doc, each a whole-word piece
    val stats = UnigramLm.tokenStats(docs, m).collect()
    stats.foreach { r =>
      r.getAs[Long]("n_words") shouldBe 8L
      r.getAs[Long]("n_uni_tokens") shouldBe 8L
      r.getAs[Double]("uni_per_word") shouldBe 1.0
    }
  }

  test("loss-based prune keeps the irreplaceable piece a probability prune drops (Kudo's statistic)") {
    // (aaaa × 90, xyz × 10) with ONE multi-char slot: "aa" has the higher
    // trained probability, but "aaaa" re-derives cheaply from required
    // 'a' chars while "xyz" without its own piece pays three singles —
    // the likelihood-loss ranking must keep "xyz", and the vocabulary it
    // picks must cost the corpus strictly less than the prob-pruned one.
    val table = Seq(("aaaa", 90L), ("xyz", 10L))
    val chars = Seq("a", "x", "y", "z")
    def totalCost(m: UnigramLm.Model): Double =
      table.map { case (w, f) =>
        f * UnigramLm.viterbiCost(w, m.cost, m.maxLen, excludeFullSpan = false)
      }.sum
    val byLoss = UnigramLm.trainOnWordTable(table, chars, vocabSize = 5,
      maxPieceLen = 4, emIters = 4, seedCap = 100)
    val byProb = UnigramLm.trainOnWordTable(table, chars, vocabSize = 5,
      maxPieceLen = 4, emIters = 4, seedCap = 100, pruneByLoss = false)
    byLoss.pieces.map(_._1).filter(_.length > 1) shouldBe Seq("xyz")
    byProb.pieces.map(_._1).filter(_.length > 1) shouldBe Seq("aa")
    totalCost(byLoss) should be < totalCost(byProb) / 2.0
  }

  test("iterative prune never scores worse than the probability prune on co-dependent vocabularies") {
    // ("abab" × 50, "cd" × 30), one multi slot: a SINGLE-SHOT loss prune
    // would keep "cd" believing "abab" re-derives from "ab"+"ab" — and
    // then drop "ab" in the same stroke (measured 2× worse corpus cost).
    // The iterative shrink re-scores against each round's actual
    // survivors and lands on the optimal "abab".
    val table = Seq(("abab", 50L), ("cd", 30L))
    val chars = Seq("a", "b", "c", "d")
    def totalCost(m: UnigramLm.Model): Double =
      table.map { case (w, f) =>
        f * UnigramLm.viterbiCost(w, m.cost, m.maxLen, excludeFullSpan = false)
      }.sum
    val byLoss = UnigramLm.trainOnWordTable(table, chars, vocabSize = 5,
      maxPieceLen = 4, emIters = 4, seedCap = 100)
    val byProb = UnigramLm.trainOnWordTable(table, chars, vocabSize = 5,
      maxPieceLen = 4, emIters = 4, seedCap = 100, pruneByLoss = false)
    byLoss.pieces.map(_._1).filter(_.length > 1) shouldBe Seq("abab")
    totalCost(byLoss) should be <= totalCost(byProb)
  }

  test("trained model is bit-identical under repartitioning (pure function of the corpus)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = UnigramLm.train(docs, vocabSize = 60, emIters = 2).pieces
    val b = UnigramLm.train(docs.repartition(7), vocabSize = 60, emIters = 2).pieces
    b shouldBe a // costs compared exactly, Double bits included
  }

  test("token stats reconcile with a driver-side recount on real corpus data") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(50)
    val m = UnigramLm.train(docs, vocabSize = 80, emIters = 2)
    val out = UnigramLm.tokenStats(docs, m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val direct = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long"), lower(trim(col("text"))))
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        val ws = t.split(" +").filter(_.nonEmpty)
        id -> ((ws.length.toLong,
          ws.map(w => UnigramLm.viterbiTokens(w, m).toLong).sum))
      }.toMap
    out shouldBe direct
    // and segmentation can't beat one token per word or lose to chars
    out.values.foreach { case (nw, nu) => nu should be >= nw }
  }

  test("fertility report: ≥ 1 per source, arithmetic consistent with token stats") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val rep = graft.queries.CorpusQueries
      .unigramFertility(spark, sf("sf0.001")).collect()
    rep should not be empty
    rep.foreach { r =>
      val (tw, tu) = (r.getAs[Long]("total_words"), r.getAs[Long]("total_uni_tokens"))
      tu should be >= tw // a word can't segment to < 1 token
      r.getAs[Double]("fertility") shouldBe tu.toDouble / tw
    }
    // source-summed totals reconcile with the per-doc stats frame (the
    // report must lose no rows to its source join)
    val m = UnigramLm.train(docs, vocabSize = 200)
    val perDoc = UnigramLm.tokenStats(docs, m)
      .agg(sum("n_words"), sum("n_uni_tokens")).head()
    rep.map(_.getAs[Long]("total_words")).sum shouldBe perDoc.getLong(0)
    rep.map(_.getAs[Long]("total_uni_tokens")).sum shouldBe perDoc.getLong(1)
  }

  test("empty corpus degrades to the empty model") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    UnigramLm.train(noDocs).pieces shouldBe empty
    UnigramLm.tokenStats(noDocs, hand).count() shouldBe 0
  }
}
