package graft.text

import graft.SparkSpec

class CorpusLawsSpec extends SparkSpec {
  import spark.implicits._

  /** Build a doc whose text repeats `word` n times. */
  private def rep(word: String, n: Int): String = Seq.fill(n)(word).mkString(" ")

  test("perfect Zipf corpus fits slope -1 with r2 = 1") {
    // tf = 12/rank exactly: ranks 1..4 -> 12, 6, 4, 3. ln tf = ln 12 - ln rank.
    val docs = Seq(
      (0L, rep("a", 12), "s1"),
      (1L, rep("b", 6) + " " + rep("c", 4), "s2"),
      (2L, rep("d", 3), "s1")
    ).toDF("doc_id", "text", "source")
    val r = CorpusLaws.lawsReport(docs).collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 25L
    r.getAs[Long]("n_types") shouldBe 4L
    r.getAs[Double]("zipf_slope") shouldBe -1.0 +- 1e-9
    r.getAs[Double]("zipf_intercept") shouldBe math.log(12.0) +- 1e-9
    r.getAs[Double]("zipf_r2") shouldBe 1.0 +- 1e-9
  }

  test("perfect Heaps corpus fits beta and ln K exactly") {
    // Three sources sized so (tokens, types) sits exactly on V = N^0.5:
    // N=4 -> V=2, N=16 -> V=4, N=64 -> V=8 (distinct words per source).
    def src(tag: String, types: Int, perType: Int): String =
      (0 until types).map(i => rep(s"$tag$i", perType)).mkString(" ")
    val docs = Seq(
      (0L, src("a", 2, 2), "s1"),   // 4 tokens, 2 types
      (1L, src("b", 4, 4), "s2"),   // 16 tokens, 4 types
      (2L, src("c", 8, 8), "s3")    // 64 tokens, 8 types
    ).toDF("doc_id", "text", "source")
    val r = CorpusLaws.lawsReport(docs).collect()(0)
    r.getAs[Double]("heaps_beta") shouldBe 0.5 +- 1e-9
    r.getAs[Double]("heaps_logk") shouldBe 0.0 +- 1e-9
    r.getAs[Double]("heaps_r2") shouldBe 1.0 +- 1e-9
  }

  test("rank ties break deterministically and moments match a hand fit") {
    // Two terms with equal tf share no rank: (tf desc, term asc) is total.
    val docs = Seq(
      (0L, "x x y y z", "s1"),
      (1L, "z w", "s2")
    ).toDF("doc_id", "text", "source")
    // tf: x=2, y=2, z=2, w=1 -> ranks x=1, y=2, z=3, w=4.
    val pts = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 2.0), (4.0, 1.0))
      .map { case (rk, tf) => (math.log(rk), math.log(tf)) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = CorpusLaws.lawsReport(docs).collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 7L
    r.getAs[Long]("n_types") shouldBe 4L
    r.getAs[Double]("zipf_slope") shouldBe slope +- 1e-9
  }

  test("the corpus is exploded once: the final query reads pinned snapshots only") {
    // The (source, term, c) table is checkpoint-pinned (PrefixSum's eager
    // side jobs and the final query are separate executions, so AQE stage
    // reuse can't span them). If the pin is lost, the Heaps branch re-scans
    // and re-explodes the corpus inside the final query — which is exactly
    // a Generate node in this plan.
    val docs = Seq((0L, "x x y", "s1"), (1L, "y z", "s2"))
      .toDF("doc_id", "text", "source")
    val plan = CorpusLaws.lawsReport(docs).queryExecution.executedPlan.toString
    plan should not include "Generate"
  }

  test("runs on the sf0.001 documents table with finite fits") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val r = CorpusLaws.lawsReport(docs).collect()(0)
    r.getAs[Long]("n_tokens") should be > 0L
    r.getAs[Long]("n_types") should be > 0L
    assert(!r.getAs[Double]("zipf_slope").isNaN)
    assert(!r.getAs[Double]("heaps_beta").isNaN)
    r.getAs[Double]("zipf_r2") should (be >= 0.0 and be <= 1.0 + 1e-12)
  }
}
