package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelCentroidsSpec extends SparkSpec {
  import spark.implicits._

  // Three classes on clean axes: 0 ~ east, 1 ~ slightly-rotated east,
  // 2 ~ north. Label 0's nearest confusable class must be 1 (and vice
  // versa); label 2 is closer to 1 (rotated toward north) than to 0.
  private val vecs = Seq(
    (0L, Seq(1.0, 0.0), 0), (1L, Seq(1.0, 0.2), 0),
    (2L, Seq(0.9, 0.3), 1), (3L, Seq(0.9, 0.5), 1),
    (4L, Seq(0.0, 1.0), 2), (5L, Seq(0.2, 1.0), 2)).toDF("id", "vec", "label")

  test("centroids are per-dimension means") {
    val c = LabelCentroids.centroids(vecs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    c((0, 0)) shouldBe 1.0 +- 1e-12
    c((0, 1)) shouldBe 0.1 +- 1e-12
    c((2, 0)) shouldBe 0.1 +- 1e-12
    c((2, 1)) shouldBe 1.0 +- 1e-12
  }

  test("each label maps to its most confusable other label") {
    val m = LabelCentroids.confusions(vecs)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    m(0) shouldBe 1
    m(1) shouldBe 0
    m(2) shouldBe 1
  }

  test("sim is the cosine of the two centroids") {
    val out = LabelCentroids.confusions(vecs)
      .filter($"label" === 0).collect()(0).getDouble(2)
    val a = Array(1.0, 0.1); val b = Array(0.9, 0.4)
    val cos = (a(0) * b(0) + a(1) * b(1)) /
      (math.sqrt(a(0) * a(0) + a(1) * a(1)) * math.sqrt(b(0) * b(0) + b(1) * b(1)))
    out shouldBe cos +- 1e-12
  }

  test("null labels and null vectors are excluded") {
    val withNulls = Seq(
      (0L, Option(Seq(1.0, 0.0)), Option(0)),
      (1L, Option(Seq(0.0, 1.0)), Option(1)),
      (2L, Option.empty[Seq[Double]], Option(1)),
      (3L, Option(Seq(9.0, 9.0)), Option.empty[Int]))
      .toDF("id", "vec", "label")
    val c = LabelCentroids.centroids(withNulls).collect()
    c.map(_.getInt(0)).distinct.sorted shouldBe Array(0, 1)
    // label 1's centroid uses only id 1 (id 2's null vec dropped)
    c.filter(r => r.getInt(0) == 1 && r.getInt(1) == 1)(0)
      .getDouble(2) shouldBe 1.0 +- 1e-12
  }

  test("a single-label corpus yields no confusions") {
    val mono = Seq((0L, Seq(1.0), 5), (1L, Seq(0.5), 5)).toDF("id", "vec", "label")
    LabelCentroids.confusions(mono).count() shouldBe 0
  }
}
