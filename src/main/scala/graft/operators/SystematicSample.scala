package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Systematic PPS sampling (m64) — draw EXACTLY k sample points with
  * inclusion probability proportional to a weight (token mass), the
  * classic midpoint-systematic scheme: lay the corpus out on a line in
  * deterministic md5 order, each document occupying a [cum, cum+w)
  * segment, and take the documents containing the k midpoints
  * (i + ½)·(W/k). Complements the sampling tier's per-group cap (m21),
  * per-group budget (m27) and temperature rebalance (m34): those bound
  * GROUPS, this draws a fixed-size corpus-wide sample where a document
  * twice as heavy is twice as likely — and a document heavier than one
  * stride is hit multiple times (n_hits = its repeat count, the PPS
  * convention).
  *
  * Everything is a pure function of (weights, k): no RNG state, and the
  * md5 order makes the "random" layout reproducible across engines —
  * the same determinism contract as m27/m36.
  *
  * Scale shape (100 TB): the global cumulative layout is
  * [[PrefixSum.exclusiveRunningTotalsBy]] (range-partition by the md5
  * key, per-partition totals to the driver, broadcast offsets) — NOT a
  * single-partition global window; the total mass is a 1-row broadcast
  * cross join; hit counting is a per-row projection. One corpus
  * exchange total.
  */
object SystematicSample {

  /** (keyCol, w, cum_before, n_hits) for documents hit by ≥1 of the k
    * systematic midpoints; Σ n_hits = k exactly (k ≤ total weight). */
  def sample(df: DataFrame, keyCol: String, weightCol: String,
             k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyed = df
      .select(col(keyCol), col(weightCol).cast("long").as("w"))
      .withColumn("ord", md5(col(keyCol).cast("string").cast("binary")))
    val ranked = PrefixSum
      .exclusiveRunningTotalsBy(keyed, Seq(col("ord"), col(keyCol)), "w")
      .withColumnRenamed("running", "cum_before")
    val tot = ranked.agg(sum(col("w")).cast("double").as("tw"))
    val step = col("tw") / lit(k.toDouble)
    // Midpoint t_i = (i + 0.5)·step lies in [cum, cum+w)  ⇔
    // ceil((cum+w)/step − 0.5) − ceil(cum/step − 0.5) counts such i.
    val hits = (ceil((col("cum_before") + col("w")).cast("double") / step - 0.5)
      - ceil(col("cum_before").cast("double") / step - 0.5)).cast("long")
    ranked.crossJoin(broadcast(tot))
      .withColumn("n_hits", hits)
      .filter(col("n_hits") > 0)
      .select(col(keyCol), col("w"), col("cum_before"), col("n_hits"))
  }
}
