package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Neyman allocation (Neyman 1934 — public): given a total sampling
  * budget of k rows and strata h with sizes N_h and within-stratum
  * standard deviations σ_h of the audited measurement, the
  * minimum-variance stratified sample draws n_h ∝ N_h·σ_h from each
  * stratum. This is the third allocation law in the mix-card family —
  * m100 waterfills a token budget (UniMax), m110 smooths by n^α
  * (temperature), and this one sizes AUDIT samples: which sources need
  * how many manually-inspected documents for the tightest estimate of a
  * corpus statistic at fixed labeling cost. High-variance sources (mixed
  * quality) get inspectors; uniform boilerplate sources get few no
  * matter how large.
  *
  * Exactness discipline: σ_h is computed from EXACT integral sums —
  * Σx and Σx² are decimal aggregates (never double accumulation, whose
  * result depends on partition merge order), collapsed to doubles only
  * in the final fixed-order projection σ = √(Σx²/n − (Σx/n)²). Division,
  * multiplication, subtraction and sqrt are all exactly rounded under
  * IEEE 754, so Spark and the DuckDB oracle agree bit-for-bit given the
  * same sums; the one engine-order-dependent value, the denominator
  * Σ_h N_h·σ_h, follows the m110 convention (plain sum over the
  * stratum-count-bounded frame — ulp-level association differences
  * vanish under the oracle's 6-dp canonicalization). Allocations are
  * reported CONTINUOUS (docs, a double) rather than rounded: an integer
  * round would put a discrete jump at a rounding boundary where an ulp
  * could flip the hash, and the consumer owns the rounding policy anyway
  * (m110's alloc_tokens makes the same call).
  *
  * Scale shape: one partial-aggregated exchange of
  * (stratum, count, Σx, Σx²) — map-side combine collapses each partition
  * to ≤|strata| rows before the shuffle; everything after is
  * stratum-count-bounded with the 1-row denominator broadcast back. */
object NeymanAlloc {

  /** Allocate a budget of `k` sample rows across the strata of
    * `groupCol`, minimizing estimator variance for the integer-valued
    * measurement `xCol`. Returns one row per stratum:
    * (groupCol, n_docs, mean_x, sigma, share, alloc_docs) where
    * share = N_h·σ_h / Σ_g N_g·σ_g and alloc_docs = min(k·share, N_h)
    * (a stratum can't contribute more rows than it has). If every
    * stratum is constant (Σ N·σ = 0, Neyman undefined — any allocation
    * has zero variance), share and alloc_docs are null, the house
    * /0 → null convention. */
  def allocate(perDoc: DataFrame, groupCol: String, xCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"budget must be >= 1, got $k")
    // Exact sums: x as decimal BEFORE squaring — decimal·decimal widens
    // to decimal(38,0), so a web-scale Σx² can't overflow a long (ANSI
    // mode would throw) and never touches a double until the projection.
    val xDec = col(xCol).cast("decimal(19,0)")
    val sums = perDoc.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      sum(xDec).as("sx"),
      sum(xDec * xDec).as("sx2"))
    val n = col("n_docs").cast("double")
    val mean = col("sx").cast("double") / n
    val sigma = sqrt(greatest(
      col("sx2").cast("double") / n - mean * mean, lit(0.0)))
    val stats = sums
      .withColumn("mean_x", mean)
      .withColumn("sigma", sigma)
      .withColumn("w", col("n_docs").cast("double") * col("sigma"))
    val denom = stats.agg(sum("w").as("denom"))
    stats.crossJoin(broadcast(denom))
      .withColumn("share",
        when(col("denom") > 0, col("w") / col("denom")))
      // least() skips nulls in BOTH engines (least(NULL, N) = N), so the
      // undefined-Neyman null must be propagated explicitly, not relied on
      .withColumn("alloc_docs", when(col("share").isNotNull,
        least(lit(k.toDouble) * col("share"), col("n_docs").cast("double"))))
      .select(col(groupCol), col("n_docs"), col("mean_x"), col("sigma"),
        col("share"), col("alloc_docs"))
  }
}
