package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield, Lund & Thorup, JACM 2007 — public): a
  * weighted sample WITHOUT replacement of k rows whose selection
  * probabilities adapt to the weight distribution, plus the unbiased
  * subset-sum estimator that makes the sample a drop-in stand-in for the
  * full corpus in any "total tokens/chars in stratum X" question. Each
  * row draws a deterministic uniform u_i from its key (the engine-portable
  * md5 discipline every sampler here uses — see [[HashSplit]]), gets
  * priority q_i = w_i / u_i, and the k highest priorities win. With
  * τ = the (k+1)-th highest priority, each sampled row reports
  * ŵ_i = max(w_i, τ): E[Σ ŵ over the sample] equals the true Σ w over
  * the population — the DLT theorem — so downstream aggregations over the
  * sample are unbiased with near-optimal variance (within 1/(k-1) of the
  * best possible k-sample scheme).
  *
  * Heavy rows (w_i ≥ τ) are sampled with certainty and report their exact
  * weight, which is why this beats uniform-u sampling for skewed corpora:
  * a boilerplate-dominating megadoc can never be missed.
  *
  * Determinism/portability: u_i = (2·v_i + 1) / 2^33 where v_i is the
  * first 8 md5 hex chars of the key as an integer — so q_i
  * = w_i · 2^33 / (2·v_i + 1). Every operation here (integer-valued
  * doubles below 2^33, a multiply by a power of two, one division) is
  * exactly rounded under IEEE 754, so Spark and the DuckDB oracle compute
  * bit-identical priorities — no libm transcendentals anywhere (the same
  * reason [[QuotaSample]] ranks by raw md5: pow/log results may differ by
  * an ulp across engines and flip a rank). The Efraimidis–Spirakis
  * u^(1/w) formulation was rejected for exactly that pow dependence.
  *
  * Scale shape: computing q is a zero-exchange codegen projection; the
  * k-highest selection is one TakeOrderedAndProject (per-partition
  * bounded heaps, driver merges numPartitions·(k+1) rows — the T1/m53
  * discipline); everything after operates on the (k+1)-row frame
  * (single-partition window is bounded by construction) with τ broadcast.
  * The corpus is never globally sorted and never fully shuffled. */
object PrioritySample {

  /** Integer value of the first 8 md5 hex chars of `key` — a uniform
    * 32-bit draw, exact in a double. */
  private def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Sample `k` rows from `df` with probability adapted to integer-valued
    * weight column `wCol` (must be ≥ 1 and exactly representable in a
    * double, i.e. < 2^53/2^33 = 2^20 — token/char counts qualify); `keyCol`
    * seeds the per-row uniform and breaks priority ties. Returns
    * (keyCol, wCol, priority, est_weight) for the k winners; if the input
    * has ≤ k rows, every row is returned with est_weight = its own weight
    * (τ = 0 — the estimator is exact, not just unbiased, in that regime). */
  def sample(df: DataFrame, keyCol: String, wCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val q = col(wCol).cast("double") * lit(8589934592.0) /
      (hash32(col(keyCol)) * 2 + 1).cast("double")
    val keyed = df.select(col(keyCol), col(wCol), q.as("priority"))
    // k+1, not k: the runner-up's priority IS the estimator's threshold.
    val top = keyed.orderBy(desc("priority"), col(keyCol)).limit(k + 1)
    val rn = row_number().over(Window.orderBy(desc("priority"), col(keyCol)))
    val ranked = top.withColumn("rn", rn)
    val tau = ranked.agg(coalesce(
      max(when(col("rn") === k + 1, col("priority"))), lit(0.0)).as("tau"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col(keyCol), col(wCol), col("priority"),
        greatest(col(wCol).cast("double"), col("tau")).as("est_weight"))
  }

  /** The DuckDB replay of [[sample]]'s priority for a key expression —
    * kept adjacent so the two can only drift visibly. The hex parse is
    * the digit fold (strpos over the hex alphabet is 1-based, hence the
    * -1), exact in BIGINT. */
  def oracleQExpr(keyExpr: String, wExpr: String): String =
    s"CAST($wExpr AS DOUBLE) * 8589934592.0 / CAST(2 * list_reduce(" +
      s"list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, 8), " +
      s"i -> CAST(strpos('0123456789abcdef', " +
      s"substr(md5(CAST($keyExpr AS VARCHAR)), i, 1)) - 1 AS BIGINT))), " +
      s"(a, x) -> a * 16 + x) + 1 AS DOUBLE)"
}
