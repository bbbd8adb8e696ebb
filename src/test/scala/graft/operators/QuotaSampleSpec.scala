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

  test("tokenBudgetSample: budget bounds pre-row mass, first doc always kept") {
    val df = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 300L),
      (10L, "b", 9000L), // single doc over budget — still kept
      (20L, "c", 100L)
    ).toDF("doc_id", "source", "n_tokens")
    val r = QuotaSample.tokenBudgetSample(df, "source", "doc_id", "n_tokens", 500L)
      .collect()
    r.foreach(_.getAs[Long]("cum_before") should be < 500L)
    val bySource = r.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    bySource("a") shouldBe 2 // 300 kept (0 before), 300 kept (300 before), next cut at 600
    bySource("b") shouldBe 1
    bySource("c") shouldBe 1
  }

  test("tokenBudgetSample: deterministic across partitionings") {
    val df = (0 until 200).map(i => (i.toLong, s"s${i % 5}", (i % 17 + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val a = QuotaSample.tokenBudgetSample(df.repartition(13), "source", "doc_id", "n_tokens", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = QuotaSample.tokenBudgetSample(df.coalesce(1), "source", "doc_id", "n_tokens", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    a shouldBe b
  }
}
