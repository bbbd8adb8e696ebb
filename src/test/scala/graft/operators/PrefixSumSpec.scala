package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("differential: matches the single-partition window cumsum") {
    val df = (0L until 1000L).map(i => (i, (i * 7) % 13)).toDF("k", "v")
      .repartition(11) // scrambled input partitioning
    val got = PrefixSum.exclusiveRunningTotals(df, "k", "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = df
      .withColumn("running",
        coalesce(sum("v").over(Window.orderBy("k").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    got shouldBe want
  }

  test("no single-partition global sort window in the plan") {
    val df = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    val plan = PrefixSum.exclusiveRunningTotals(df, "k", "v")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("correct under a downstream coalesce(1) (single-file write path)") {
    // Regression: a coalesce fuses all range partitions into one task; a
    // task-id-based offset lookup would hand every partition offset 0.
    val df = (0L until 1000L).map(i => (i, (i * 7) % 13)).toDF("k", "v")
      .repartition(11)
    val got = PrefixSum.exclusiveRunningTotals(df, "k", "v")
      .coalesce(1).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = df
      .withColumn("running",
        coalesce(sum("v").over(Window.orderBy("k").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    got shouldBe want
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    PrefixSum.exclusiveRunningTotals(df, "k", "v").count() shouldBe 0
  }

  test("first row starts at zero; totals telescope") {
    val df = Seq((10L, 5L), (20L, 7L), (30L, 11L)).toDF("k", "v")
    val rows = PrefixSum.exclusiveRunningTotals(df, "k", "v")
      .orderBy("k").collect()
    rows.map(_.getLong(2)).toSeq shouldBe Seq(0L, 5L, 12L)
  }

  test("generalized: desc order + tie-break matches the window cumsum, keeps all columns") {
    // quality has deliberate ties so the doc_id tie-break is load-bearing
    val df = (0L until 500L).map(i => (i, (i % 7).toDouble / 7.0, (i * 3) % 11))
      .toDF("doc_id", "quality", "v").repartition(9)
    val got = PrefixSum
      .exclusiveRunningTotalsBy(df, Seq(col("quality").desc, col("doc_id").asc), "v")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSeq
    val w = Window.orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Long.MinValue, -1)
    val want = df
      .withColumn("running", coalesce(sum("v").over(w), lit(0L)))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSeq
    got shouldBe want
  }

  test("input pin is freed once ranged materializes (one snapshot survives)") {
    // Regression (r10 advice): Dataset.unpersist after localCheckpoint is
    // a no-op — the input pin must be freed via captured RDD handles, or
    // both corpus-sized snapshots stay pinned for the query's lifetime.
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val df = (0L until 500L).map(i => (i, i % 5)).toDF("k", "v")
    val before = sc.getPersistentRDDs.keySet
    PrefixSum.exclusiveRunningTotals(df, "k", "v").count() shouldBe 500
    (sc.getPersistentRDDs.keySet.toSet -- before).size shouldBe 1 // ranged only
    val before2 = sc.getPersistentRDDs.keySet
    PrefixSum.exclusiveRunningTotalsBy(df, Seq(col("k").desc), "v").count() shouldBe 500
    (sc.getPersistentRDDs.keySet.toSet -- before2).size shouldBe 1
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("generalized: no single-partition window in the plan either") {
    val df = (0L until 100L).map(i => (i, i.toDouble, i)).toDF("doc_id", "quality", "v")
    val plan = PrefixSum
      .exclusiveRunningTotalsBy(df, Seq(col("quality").desc, col("doc_id")), "v")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }
}
