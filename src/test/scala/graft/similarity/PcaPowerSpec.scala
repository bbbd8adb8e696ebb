package graft.similarity

import graft.SparkSpec

class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exactly-planted dominant direction") {
    // Points strictly along u = (3,4)/5 (plus the mean): the only
    // direction with variance, so the top component is u exactly.
    val u = Array(0.6, 0.8)
    val ts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val vecs = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array((10 + t * u(0)).toFloat, (20 + t * u(1)).toFloat))
    }.toDF("vec_id", "embedding")
    val out = PcaPower.topComponent(vecs, iterations = 12)
      .collect().sortBy(_.getLong(0))
    val loadings = out.map(_.getDouble(1))
    loadings(0) shouldBe 0.6 +- 1e-6
    loadings(1) shouldBe 0.8 +- 1e-6
    // eigenvalue = variance along u: mean of t^2 = (4+1+0+1+4)/5 = 2.
    out(0).getDouble(2) shouldBe 2.0 +- 1e-6
  }

  test("matches the analytic 2x2 eigenpair on correlated data") {
    // Covariance of {(±1,0),(0,±a)} family built from two directions.
    val vecs = Seq(
      (0L, Array(1.0f, 0.5f)), (1L, Array(-1.0f, -0.5f)),
      (2L, Array(0.5f, 1.0f)), (3L, Array(-0.5f, -1.0f))
    ).toDF("vec_id", "embedding")
    // C = (1/4) Σ x xᵀ = [[0.625, 0.5], [0.5, 0.625]] (mean is 0);
    // top eigenvector (1,1)/√2, eigenvalue 1.125.
    val out = PcaPower.topComponent(vecs, iterations = 20)
      .collect().sortBy(_.getLong(0))
    out(0).getDouble(1) shouldBe math.sqrt(0.5) +- 1e-9
    out(1).getDouble(1) shouldBe math.sqrt(0.5) +- 1e-9
    out(0).getDouble(2) shouldBe 1.125 +- 1e-9
  }

  test("sign convention: first nonzero loading is positive and runs on sf0.001") {
    val vecs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val out = PcaPower.topComponent(vecs, iterations = 8)
      .collect().sortBy(_.getLong(0))
    out.length shouldBe 64
    val norm = math.sqrt(out.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    norm shouldBe 1.0 +- 1e-9
    val lead = out.map(_.getDouble(1)).find(math.abs(_) > 1e-12).get
    lead should be > 0.0
    out(0).getDouble(2) should be > 0.0
  }
}
