package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension (SURVEY §2.8 F2/F3; reference
  * retail_pipeline_assets.py:125-142 — `pd.date_range` + `.day/.month/.year/
  * .weekday/.isocalendar().week`).
  *
  * Semantic traps handled (SURVEY §7.4.4-5):
  *  - pandas weekday is Monday=0; Spark `dayofweek` is Sunday=1 →
  *    `(dayofweek(d)+5) % 7`.
  *  - pandas `isocalendar().week` is ISO-8601, which matches Spark
  *    `weekofyear` (2019-12-30 → week 1 of 2020 on both).
  *
  * Generated with `sequence` + `explode` — a single-task expression, no
  * driver-side loop; a 100-year calendar is ~37k rows, trivially
  * broadcastable to any fact join.
  */
object DimDate {
  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)), expr("interval 1 day")))
        .as("date"))
    days.select(
      col("date"),
      dayofmonth(col("date")).cast("long").as("day"),
      month(col("date")).cast("long").as("month"),
      year(col("date")).cast("long").as("year"),
      ((dayofweek(col("date")) + lit(5)) % 7).cast("long").as("weekday"),
      weekofyear(col("date")).cast("long").as("week"))
  }
}
