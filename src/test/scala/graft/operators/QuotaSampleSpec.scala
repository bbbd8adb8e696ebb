package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QuotaSampleSpec extends SparkSpec {
  import spark.implicits._

  /** The naive single-window reference plan the pruned sampler must match. */
  private def naive(df: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .select("doc_id", "source", "rk")
  }

  private def corpus(n: Int, groups: Int): DataFrame =
    (0 until n).map(i => (i.toLong, s"src${i % groups}")).toDF("doc_id", "source")

  test("two-phase pruned result equals the naive window plan") {
    // Many input partitions so the partial prune actually discards rows.
    val df = corpus(500, 7).repartition(13)
    val got = QuotaSample.quotaSample(df, "source", "doc_id", cap = 5)
      .orderBy("source", "rk").collect().toSeq
    val want = naive(df, 5).orderBy("source", "rk").collect().toSeq
    got shouldBe want
    got.size shouldBe 7 * 5
  }

  test("groups smaller than the cap keep every row") {
    val df = corpus(6, 3) // 2 rows per source
    val r = QuotaSample.quotaSample(df, "source", "doc_id", cap = 7)
    r.count() shouldBe 6
    r.agg(max("rk")).as[Long].collect()(0) shouldBe 2
  }

  test("deterministic across partitionings") {
    val a = QuotaSample.quotaSample(corpus(300, 4).repartition(17), "source", "doc_id", 3)
      .orderBy("source", "rk").collect().toSeq
    val b = QuotaSample.quotaSample(corpus(300, 4).coalesce(1), "source", "doc_id", 3)
      .orderBy("source", "rk").collect().toSeq
    a shouldBe b
  }

  test("cap must be positive") {
    an[IllegalArgumentException] should be thrownBy
      QuotaSample.quotaSample(corpus(10, 2), "source", "doc_id", 0)
  }
}
