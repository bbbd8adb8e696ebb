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

  test("the same raw score calibrates differently across sources") {
    // a mid-quality doc sits at different percentiles in a clean vs a
    // noisy source — the point of per-source calibration
    val bySource = CorpusQueries.qualityPercentiles(spark, dir)
      .groupBy("source").agg(avg("quality").as("avg_q")).collect()
    bySource.length should be > 1 // the fixture has several sources
  }
}
