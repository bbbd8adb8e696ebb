package graft.similarity

import graft.SparkSpec

class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  test("a planted mislabel is the only negative margin") {
    // two tight axis-aligned clusters; vec 5 sits in cluster B but
    // carries label 0 — the curator's target
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 0), (3L, Seq(1.0, 0.1), 0),
      (4L, Seq(0.0, 1.0), 1), (6L, Seq(0.1, 0.9), 1),
      (5L, Seq(0.05, 1.0), 0) // mislabeled
    ).toDF("id", "vec", "label")
    val out = LabelNoise.marginReport(vecs)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(5L).getBoolean(6) shouldBe true
    out(5L).getInt(3) shouldBe 1 // nearest other class is the true one
    Seq(1L, 2L, 3L, 4L, 6L).foreach { id =>
      withClue(s"id $id: ") { out(id).getBoolean(6) shouldBe false }
    }
  }

  test("margins are symmetric sanity: own-cluster members score cos_own near 1") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.0, 1.0), 1)
    ).toDF("id", "vec", "label")
    val out = LabelNoise.marginReport(vecs).collect()
    out.foreach { r =>
      r.getDouble(2) shouldBe 1.0 +- 1e-12 // identical to own centroid
      r.getDouble(4) shouldBe 0.0 +- 1e-12 // orthogonal other centroid
      r.getBoolean(6) shouldBe false
    }
  }

  test("single-class corpus: no other centroid, empty report") {
    val vecs = Seq((1L, Seq(1.0, 2.0), 0), (2L, Seq(2.0, 1.0), 0))
      .toDF("id", "vec", "label")
    LabelNoise.marginReport(vecs).count() shouldBe 0L
  }

  test("zero-norm vector: null cosines propagate to a null margin, not a crash") {
    val vecs = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(1.0, 0.0), 0), (3L, Seq(0.0, 1.0), 1)
    ).toDF("id", "vec", "label")
    val r = LabelNoise.marginReport(vecs)
      .collect().map(x => x.getLong(0) -> x).toMap
    r(1L).isNullAt(5) shouldBe true
  }
}
