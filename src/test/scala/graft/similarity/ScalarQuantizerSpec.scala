package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  test("endpoints map to code 0 and 255; midpoint rounds to nearest") {
    val vecs = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, 20.0f)),
      (3L, Array(0.5f, 15.0f))
    ).toDF("vec_id", "embedding")
    val out = ScalarQuantizer.sq8(vecs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // dim 0 bounds [0,1]: x=0 -> 0, x=1 -> 255, x=0.5 -> round(127.5+epsilonless)=128.
    out((1L, 0L))._1 shouldBe 0L
    out((2L, 0L))._1 shouldBe 255L
    out((3L, 0L))._1 shouldBe 128L
    // endpoint reconstruction is exact.
    out((1L, 0L))._2 shouldBe 0.0 +- 1e-12
    out((2L, 0L))._2 shouldBe 0.0 +- 1e-12
  }

  test("constant dimension encodes as code 0 with zero error") {
    val vecs = Seq(
      (1L, Array(7.0f, 1.0f)),
      (2L, Array(7.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val rows = ScalarQuantizer.sq8(vecs)
      .filter(col("dim") === 0L).collect()
    rows.foreach { r =>
      r.getLong(2) shouldBe 0L
      r.getDouble(3) shouldBe 0.0 +- 1e-15
    }
  }

  test("reconstruction error is bounded by half a quantization step") {
    val vecs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val out = ScalarQuantizer.sq8(vecs)
    val bounds = vecs
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg((max(col("x")) - min(col("x"))).as("range"))
    val joined = out.join(bounds, Seq("dim"))
      // half-step plus float slack
      .filter(col("abs_err") > col("range") / 255.0 / 2.0 + 1e-9)
    joined.count() shouldBe 0L
    out.agg(max(col("code"))).collect()(0).getLong(0) shouldBe 255L
    out.agg(min(col("code"))).collect()(0).getLong(0) shouldBe 0L
  }
}
