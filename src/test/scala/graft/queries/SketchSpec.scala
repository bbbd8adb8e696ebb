package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q40 has no DuckDB oracle by design (HLL++/quantile-sketch internals are
  * engine-specific): instead, the sketches are bounded here against the
  * exact answers on the same data. */
class SketchSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("approx_count_distinct lands within the default 5% rsd of exact") {
    val approx = RetailQueries.sketchAggregates(spark, dir)
      .select("event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      math.abs(approx(k) - e).toDouble / e should be <= 0.05
    }
  }

  test("approx median lands between the exact 40th and 60th percentiles") {
    val approx = RetailQueries.sketchAggregates(spark, dir)
      .select("event_type", "approx_median_value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bounds = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.4)).as("lo"),
        percentile(col("value"), lit(0.6)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    bounds.foreach { case (k, (lo, hi)) =>
      approx(k) should (be >= lo and be <= hi)
    }
  }
}
