package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityPercentilesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("percentiles span [0,1] per source and are monotone in quality") {
    val rows = CorpusQueries.qualityPercentiles(spark, dir)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    rows should not be empty
    rows.foreach { case (_, _, p) => p should (be >= 0.0 and be <= 1.0) }
    rows.groupBy(_._1).foreach { case (_, g) =>
      if (g.length > 1) {
        g.map(_._3).min shouldBe 0.0 // the worst doc of every source
        g.map(_._3).max shouldBe 1.0 // and its best
        // monotone: sorting by quality (doc order within ties is what the
        // key breaks on) never decreases the percentile
        val byQ = g.sortBy(_._2).map(_._3)
        byQ.zip(byQ.tail).foreach { case (a, b) => a should be <= b }
      }
    }
  }

  test("ranged form is byte-identical to the percent_rank window form (m87/m134 convention)") {
    // Round 16 swapped the per-source percent_rank window for the
    // range-partitioned GroupedRanks pass; ranks are a pure function of
    // the (floor(q·1e6), doc_id) total order, so every pct_rank double
    // must match the window form bit-for-bit.
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.profile(col("text")).getField("quality").as("quality"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(floor(col("quality") * lit(1e6)).cast("long"), col("doc_id"))
    val windowForm = docs
      .select(col("doc_id"), percent_rank().over(w).as("pct_rank"))
      .collect()
      .map(r => r.getLong(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    val ranged = CorpusQueries.qualityPercentiles(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(3))).toMap
    ranged shouldBe windowForm
  }

  test("the same raw score calibrates differently across sources") {
    // a mid-quality doc sits at different percentiles in a clean vs a
    // noisy source — the point of per-source calibration
    val bySource = CorpusQueries.qualityPercentiles(spark, dir)
      .groupBy("source").agg(avg("quality").as("avg_q")).collect()
    bySource.length should be > 1 // the fixture has several sources
  }
}
