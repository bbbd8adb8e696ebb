package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // Hand-computed reference: corpus {"a b a", "a b c"}.
  // Bigrams: doc1 → (a,b),(b,a); doc2 → (a,b),(b,c).
  // c(a,b)=2, c(b,a)=1, c(b,c)=1; c(a)=2, c(b)=2; V=|{a,b,c}|=3; α=0.5.
  private val pAB = (2 + 0.5) / (2 + 0.5 * 3) // p(b|a) = 2.5/3.5
  private val pBA = (1 + 0.5) / (2 + 0.5 * 3) // p(a|b) = 1.5/3.5
  private val pBC = (1 + 0.5) / (2 + 0.5 * 3) // p(c|b) = 1.5/3.5

  test("self-perplexity matches the hand-computed smoothed LM") {
    val out = NgramLm.selfPerplexity(docs((1L, "a b a"), (2L, "a b c")))
      .orderBy("doc_id").collect()
    val h1 = -(math.log(pAB) + math.log(pBA)) / 2
    val h2 = -(math.log(pAB) + math.log(pBC)) / 2
    out(0).getAs[Long]("n_bigrams") shouldBe 2
    out(0).getAs[Double]("cross_entropy") shouldBe h1 +- 1e-12
    out(0).getAs[Double]("perplexity") shouldBe math.exp(h1) +- 1e-12
    out(1).getAs[Double]("cross_entropy") shouldBe h2 +- 1e-12
  }

  test("held-out scoring backs off: unseen bigram, then uniform for unseen context") {
    val lm = NgramLm.bigramCounts(docs((1L, "a b a"), (2L, "a b c")))
    // "c a": context c unseen → p = 1/V = 1/3.
    // "a c": context a seen (c(a)=2), bigram unseen → p = α/(c(a)+αV) = 0.5/3.5.
    val out = NgramLm.scoreAgainst(docs((9L, "c a"), (10L, "a c")), lm)
      .orderBy("doc_id").collect()
    out(0).getAs[Double]("cross_entropy") shouldBe -math.log(1.0 / 3) +- 1e-12
    out(1).getAs[Double]("cross_entropy") shouldBe -math.log(0.5 / 3.5) +- 1e-12
  }

  test("perplexity is always >= 1 and equals exp(cross_entropy)") {
    val corpus = docs((1L, "x y x y x y"), (2L, "x y z q r"), (3L, "z z z"))
    val rows = NgramLm.selfPerplexity(corpus).collect()
    rows should not be empty
    rows.foreach { r =>
      val h = r.getAs[Double]("cross_entropy")
      r.getAs[Double]("perplexity") should be >= 1.0
      r.getAs[Double]("perplexity") shouldBe math.exp(h) +- 1e-9
    }
  }

  test("repetitive boilerplate scores lower perplexity than novel text") {
    // One dominant pattern + a one-off novel doc in the same corpus.
    val corpus = docs(
      (1L, "buy now buy now buy now buy now"),
      (2L, "buy now buy now buy now buy now"),
      (3L, "buy now buy now buy now buy now"),
      (4L, "quarterly glacier permits lapsed unexpectedly"))
    val byDoc = NgramLm.selfPerplexity(corpus)
      .select("doc_id", "perplexity").as[(Long, Double)].collect().toMap
    byDoc(1L) should be < byDoc(4L)
  }

  test("docs with fewer than two tokens are absent; null text excluded") {
    val df = Seq((1L, Option("solo")), (2L, Option.empty[String]),
      (3L, Option("a b"))).toDF("doc_id", "text")
    NgramLm.selfPerplexity(df).select("doc_id").as[Long].collect() shouldBe
      Array(3L)
  }

  test("minCount prunes tail bigrams from the trained LM") {
    val lm = NgramLm.bigramCounts(
      docs((1L, "a b a b"), (2L, "a b q z")), minCount = 2L)
    // c(a,b)=3 survives; (b,a)=1, (b,q)=1, (q,z)=1 pruned.
    lm.collect().map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("a", "b"))
  }

  test("the LM lookup joins are broadcast (token stream never shuffles for the lookup)") {
    val plan = NgramLm.selfPerplexity(docs((1L, "a b c a b")))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("one gram pass: counts / context-mass / vocab reuse the bigram shuffle at runtime") {
    // gramsOf carries an explicit (a, b) not-null filter so the three
    // consumer subtrees canonicalize equal — without it each join infers a
    // different IsNotNull subset and the corpus is re-exploded per branch.
    // Reuse only shows in the POST-execution adaptive plan.
    val q = NgramLm.selfPerplexity(docs((1L, "a b a"), (2L, "a b c")))
    q.collect()
    q.queryExecution.executedPlan.toString should include("ReusedExchange")
  }
}
