package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series operator Spark's join zoo lacks
  * (DuckDB/kdb `ASOF JOIN`): each left row picks the single right row with
  * the greatest right-time ≤ left-time within the same key, or nulls when
  * no such row exists (left-outer semantics).
  *
  * Implemented as the distributed merge algorithm, not a point lookup:
  * both sides are tagged and unioned, then one window pass per key in
  * (time, side) order carries the latest right payload forward into each
  * left row (`last(_, ignoreNulls)` over unbounded-preceding). Cost is ONE
  * shuffle + sort on (key, time) regardless of how many right rows precede
  * each left row — the shape that survives 100 TB, where the naive
  * range-join (`l.key = r.key && r.t <= l.t` + max-per-row) explodes into
  * a per-key cross product before aggregating it back down.
  *
  * Right rows sort before left rows at equal timestamps, so a right row at
  * exactly the left time matches (inclusive ≤, as in DuckDB's `ON l.t >=
  * r.t`).
  *
  * Preconditions (both `require`d or enforced):
  *  - left/right column names must be disjoint (callers project first);
  *  - right (key, time) pairs must be unique for a deterministic pick —
  *    pre-reduce with a groupBy (as [[graft.queries.RetailQueries]] does)
  *    when the right side has intra-timestamp duplicates;
  *  - right rows with null key/time never match by join semantics and are
  *    filtered before the union (a null key would otherwise land in the
  *    null-key window partition next to null-key left rows and "match").
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"asof sides must not share column names, got: ${overlap.mkString(", ")}")
    val reserved = Set("__k", "__t", "__side", "__pay", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asof reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename: ${clash.mkString(", ")}")
    val payloadCols = right.columns.toSeq
    val r0 = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), struct(payloadCols.map(col): _*).as("__pay"))
    val payType = r0.schema("__pay").dataType
    val lAligned = left.select(
      left.columns.toIndexedSeq.map(col) ++ Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(payType).as("__pay")): _*)
    val rAligned = r0.select(
      left.schema.fields.toIndexedSeq.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__pay")): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
