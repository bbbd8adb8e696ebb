package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class EmbedOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("a planted far vector flags; the tight cloud does not") {
    // 20 vectors near the origin with slight spread, one far away.
    val cloud = (0 until 20).map(i =>
      (i.toLong, Array(0.1f * (i % 3), 0.1f * ((i + 1) % 3))))
    val far = Seq((99L, Array(50.0f, 50.0f)))
    val out = EmbedOutliers.report((cloud ++ far).toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    out(99L)._2 shouldBe true
    cloud.foreach { case (id, _) => out(id)._2 shouldBe false }
    out(99L)._1 should be > cloud.map(c => out(c._1)._1).max * 10
  }

  test("degenerate all-equal cloud: MAD 0 -> no outliers, null z") {
    val vecs = (0 until 5).map(i => (i.toLong, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val rows = EmbedOutliers.report(vecs).collect()
    rows.foreach { r =>
      r.getBoolean(3) shouldBe false
      r.isNullAt(2) shouldBe true
      r.getDouble(1) shouldBe 0.0 +- 1e-12
    }
  }

  test("ragged vector dimensions fail loudly instead of null-flagging") {
    val vecs = ((0 until 5).map(i => (i.toLong, Array(1.0f * i, 2.0f))) :+
      (99L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      EmbedOutliers.report(vecs).collect()
    }
    ex.getMessage should include("ragged embedding")
  }

  test("runs on sf0.001 embeddings with sane flag rate") {
    val vecs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val out = EmbedOutliers.report(vecs)
    val n = out.count()
    n should be > 0L
    // random unit-ish cloud: the 3.5-MAD flag rate stays small
    out.filter(col("is_outlier")).count().toDouble / n should be < 0.05
  }
}
