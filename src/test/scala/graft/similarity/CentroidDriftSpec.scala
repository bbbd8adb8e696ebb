package graft.similarity

import graft.SparkSpec

class CentroidDriftSpec extends SparkSpec {
  import spark.implicits._

  test("single group IS the corpus: distance exactly 0, cosine ~1") {
    val vecs = Seq((1L, Seq(1.0, 2.0), 0), (2L, Seq(3.0, 4.0), 0))
      .toDF("id", "vec", "label")
    val out = CentroidDrift.report(vecs).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 2L
    out.head.getDouble(3) shouldBe 0.0 // m - mg is exactly 0 per dim
    out.head.getDouble(2) shouldBe 1.0 +- 1e-12
  }

  test("hand-computed two-group drift on axis-aligned centroids") {
    // group 0 centroid (1,0), group 1 centroid (0,1), global (0.5,0.5):
    // cos = 0.5/(1·sqrt(0.5)) = 1/sqrt(2) for both; dist = sqrt(0.5)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.0, 1.0), 1)
    ).toDF("id", "vec", "label")
    val out = CentroidDrift.report(vecs)
      .collect().map(r => r.getInt(0) -> r).toMap
    val inv = 1.0 / math.sqrt(2.0)
    out(0).getDouble(2) shouldBe inv +- 1e-12
    out(1).getDouble(2) shouldBe inv +- 1e-12
    out(0).getDouble(3) shouldBe math.sqrt(0.5) +- 1e-12
  }

  test("zero-norm group centroid: cosine null, distance defined") {
    val vecs = Seq(
      (1L, Seq(1.0, -1.0), 0), (2L, Seq(-1.0, 1.0), 0), // centroid (0,0)
      (3L, Seq(2.0, 2.0), 1)
    ).toDF("id", "vec", "label")
    val out = CentroidDrift.report(vecs)
      .collect().map(r => r.getInt(0) -> r).toMap
    out(0).isNullAt(2) shouldBe true
    out(0).getDouble(3) should be > 0.0
  }

  test("null labels and null vectors are excluded from both centroids") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), Some(0)), (2L, null, Some(0)),
      (3L, Seq(0.0, 1.0), None)
    ).toDF("id", "vec", "label")
    val out = CentroidDrift.report(vecs).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 1L
    // the only surviving vector IS the corpus: zero drift
    out.head.getDouble(3) shouldBe 0.0
  }
}
