package graft.similarity

import graft.SparkSpec

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  // dim 0 carries the outlier; dim 1 is constant (must never clip)
  private val raw = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
  private def df = raw.zipWithIndex
    .map { case (x, i) => (i.toLong, Seq(x, 5.0)) }.toDF("id", "vec")

  // exact-percentile interpolation at rank q*(n-1): with n=5,
  // p05 → rank 0.2 → 1 + 0.2*(2-1) = 1.2; p95 → rank 3.8 → 4 + 0.8*(100-4) = 80.8
  private val lo = 1.2
  private val hi = 80.8

  test("components clip to the interpolated per-dimension band; constant dims never clip") {
    val out = Winsorize.clipStats(df, 0.05, 0.95)
      .orderBy("id").as[(Long, Long, Double, Double)].collect()
    out.map(_._2).toSeq shouldBe Seq(1L, 0L, 0L, 0L, 1L) // only 1.0 and 100.0 clip
    // id 0: [1.0, 5.0] -> [1.2, 5.0]
    out(0)._3 shouldBe math.sqrt(1.0 + 25.0) +- 1e-12
    out(0)._4 shouldBe math.sqrt(lo * lo + 25.0) +- 1e-12
    // id 4: [100.0, 5.0] -> [80.8, 5.0]
    out(4)._3 shouldBe math.sqrt(10000.0 + 25.0) +- 1e-12
    out(4)._4 shouldBe math.sqrt(hi * hi + 25.0) +- 1e-12
  }

  test("interior values pass through untouched (norm_after = norm_before)") {
    val out = Winsorize.clipStats(df, 0.05, 0.95)
      .filter($"id".isin(1L, 2L, 3L))
      .as[(Long, Long, Double, Double)].collect()
    out.foreach { case (_, n, before, after) =>
      n shouldBe 0L
      after shouldBe before // bit-identical: the clip lambda returned x itself
    }
  }

  test("a degenerate band (qLo = qHi = median) clips everything to the median") {
    val out = Winsorize.clipStats(df, 0.5, 0.5)
      .orderBy("id").as[(Long, Long, Double, Double)].collect()
    // dim0 median = 3.0, dim1 median = 5.0; only the id=2 row is untouched
    out.map(_._2).toSeq shouldBe Seq(1L, 1L, 0L, 1L, 1L)
    out.foreach(r => r._4 shouldBe math.sqrt(9.0 + 25.0) +- 1e-12)
  }
}
