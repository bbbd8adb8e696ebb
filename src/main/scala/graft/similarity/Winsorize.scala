package graft.similarity

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension winsorization of an embedding column: clip every
  * component to its dimension's [q_lo, q_hi] quantile band — the standard
  * outlier control before indexing/training, so a handful of corrupt
  * vectors (a bad encoder batch, a NaN-adjacent export) cannot stretch
  * the quantizer's training range or dominate a dot product.
  *
  * Two stages:
  *   1. bounds: explode to (pos, x), one aggregation → per-dimension
  *      lo/hi quantiles, then fold the dim-sized bounds table into two
  *      ordered arrays on a SINGLE row. Exact `percentile` here (it is
  *      what the DuckDB oracle's quantile_cont computes); at 100 TB swap
  *      in approx_percentile — same shape, sketch-mergeable, no sort.
  *   2. clip: broadcast the one-row bounds and clip each vector with two
  *      zip_with passes — a pure codegen'd projection, no per-row join.
  *      The exchange carries (pos, x) pairs once for the bounds pass;
  *      the clip pass itself never shuffles.
  *
  * Per-row statistics (norms via the codegen'd graft_dot, clip counts via
  * zip_with compare) stay inside the row — order-deterministic in both
  * engines, so the oracle hash-matches them; cross-row double sums would
  * not be.
  */
object Winsorize {

  /** (id, n_clipped, norm_before, norm_after) per vector, with components
    * clipped to the per-dimension [qLo, qHi] quantile band. `vecs`:
    * (id, vec double[]); vectors must share one dimensionality (the
    * bounds arrays are positional). */
  def clipStats(vecs: DataFrame, qLo: Double, qHi: Double): DataFrame = {
    val spark = vecs.sparkSession
    // (pos, x) only — id never rides the bounds exchange. BOTH quantiles
    // from ONE percentile(array(...)) aggregate: exact percentile buffers
    // the full per-dimension value list, so two separate aggregates would
    // build and merge that list twice.
    val comps = vecs.select(posexplode(col("vec")).as(Seq("pos", "x")))
    val bounds = comps.groupBy("pos")
      .agg(percentile(col("x"), array(lit(qLo), lit(qHi))).as("q"))
      .select(col("pos"), col("q").getItem(0).as("lo_v"),
        col("q").getItem(1).as("hi_v"))
    val boundsRow = bounds.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("lo_v")))),
        s => s.getField("lo_v")).as("lo_arr"),
      transform(array_sort(collect_list(struct(col("pos"), col("hi_v")))),
        s => s.getField("hi_v")).as("hi_arr"))
    val clipped = zip_with(
      zip_with(col("vec"), col("lo_arr"), (x, l) => greatest(x, l)),
      col("hi_arr"), (x, h) => least(x, h))
    vecs.crossJoin(broadcast(boundsRow))
      .withColumn("clipped", clipped)
      .select(col("id"),
        aggregate(
          zip_with(col("vec"), col("clipped"),
            (a, b) => when(a === b, 0L).otherwise(1L)),
          lit(0L), (acc, f) => acc + f).as("n_clipped"),
        sqrt(GraftFunctions.dot(spark, col("vec"), col("vec"))).as("norm_before"),
        sqrt(GraftFunctions.dot(spark, col("clipped"), col("clipped"))).as("norm_after"))
  }
}
