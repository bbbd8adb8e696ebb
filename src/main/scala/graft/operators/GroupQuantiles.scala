package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group quantiles by nearest-rank selection — the
  * scale-correct way to compute distribution cards over 100 TB groups.
  *
  * Spark's exact `percentile` (and DuckDB's `quantile_cont`) are
  * AGGREGATES: their buffer holds every value of the group, so a group
  * with a billion rows materializes a billion-element array in one
  * task's memory — the same class of scale bug as a single-partition
  * window. Nearest-rank selection (the classical "type 1" quantile
  * definition, Hyndman & Fan 1996, public) needs only a per-group rank
  * over a total order.
  *
  * Ranks come from [[GroupedRanks]] (round 16; previously a
  * `Window.partitionBy(group)` pair): the round-15 Zipf fixture
  * (head:tail 102:1) proved the per-group window's max sort task tracks
  * the HEAD group linearly — the m87 cliff, fixed there by the
  * range-partitioned rank (m134, max task 141× smaller on identical
  * input). Here the same escalation applies: the (group, value, tie)
  * order is range-partitioned so a big group SPANS partitions instead
  * of owning one task, and the group count rides along for free
  * (removing the second frame-less count window too). Output identical
  * to the window form — ranks are a pure function of the total order,
  * not the partitioning (GroupQuantilesSpec pins byte-identity).
  *
  * Definition: for quantile q over a group of n values ordered by
  * (value, tieCol), the reported value has rank floor(q·(n−1)) + 1 —
  * q=0 is the minimum, q=1 the maximum, q=0.5 the lower median. The
  * tie column makes the ORDER total, so the selected value is a pure
  * function of the data (partition-invariant), and the oracle replays
  * the identical rank arithmetic (floor over the same IEEE doubles).
  *
  * One range exchange on (group, value, tie); output is
  * |groups| × |qs| rows.
  */
object GroupQuantiles {

  /** (groupCol, q, n, value) per group × quantile. `tieCol` breaks value
    * ties into a total order (any unique-per-row key works). */
  def nearestRank(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must list at least one quantile")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]"))
    // The output schema reuses the names q/n/value, so a group column by
    // one of those names would collide in the final projection; internal
    // working columns are __gq_-prefixed so INPUT columns named rn/n/q
    // are never silently replaced by withColumn.
    require(!Set("q", "n", "value").contains(groupCol),
      s"groupCol '$groupCol' collides with an output column name (q/n/value)")
    val ranked = GroupedRanks.withRankAndCount(
      df.select(col(groupCol), col(valueCol), col(tieCol)),
      groupCol, Seq(col(valueCol), col(tieCol)),
      rankCol = "__gq_rk", countCol = "__gq_n")
    val qCol: Column = explode(array(qs.map(lit(_)): _*))
    // The explode+filter runs in the post-rank projection (generate →
    // filter pipelines in one pass, nothing materializes |qs|× rows and
    // no extra exchange) — each row evaluates |qs| rank predicates and
    // at most |qs| rows per group survive.
    ranked
      .select(col(groupCol), col(valueCol),
        (col("__gq_rk") + 1L).as("__gq_rn"), col("__gq_n"), qCol.as("__gq_q"))
      .filter(col("__gq_rn") ===
        floor(col("__gq_q") * (col("__gq_n") - 1L).cast("double")).cast("long") + 1L)
      .select(col(groupCol), col("__gq_q").as("q"), col("__gq_n").as("n"),
        col(valueCol).as("value"))
  }
}
