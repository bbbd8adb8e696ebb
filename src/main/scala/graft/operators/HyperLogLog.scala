package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch (Flajolet et al. 2007, with the
  * linear-counting small-range correction from the original paper /
  * Heule et al. 2013's presentation — all public) — the MERGEABLE
  * distinct-count the 100 TB tier uses where exact distinct is a
  * corpus-sized exchange: per group, the sketch is m = 2^12 registers
  * (max leading-zero rank per hash bucket), so the shuffle carries at
  * most groups × 4096 (bucket, rho) integer rows with map-side `max`
  * partials — bounded state regardless of corpus size, and register
  * `max` is commutative/idempotent, so the sketch is order- and
  * partition-invariant and unions by pointwise max (spec-pinned).
  *
  * Spark ships approx_count_distinct (HLL++), but its sketch is
  * engine-internal — this one is built from the repo's portable md5
  * convention (first 48 bits of md5, the m137/DSIR recipe), so the
  * DuckDB oracle recomputes the registers AND the estimate bit-for-bit:
  * every register term 2^−rho is a dyadic rational ≥ 2^−37 and the
  * register sum stays < 2^12, so the double sum is EXACT (53-bit
  * mantissa holds 49) — order-independent, bit-identical cross-engine,
  * which makes even the linear-counting branch selection deterministic.
  *
  * Hash layout: h ∈ [0, 2^48) from md5 hex12; bucket = top 12 bits,
  * rho = leading zeros of the remaining 36 bits + 1 ∈ [1, 37] via
  * `bin()` length (minimal binary string in BOTH engines — exact
  * integer arithmetic, no float log2 near power-of-two boundaries).
  * Estimate: E = α·m²/Σ 2^−M_j (absent registers contribute 2^0);
  * linear counting m·ln(m/V) when E ≤ 2.5m and V = m − hit > 0. The
  * 48-bit hash caps distinct-value resolution at ~2^24 per group before
  * hash collisions bias the EXACT side (birthday bound) — the sketch
  * itself saturates far later; documented engine constant.
  */
object HyperLogLog {

  val P = 12
  val M = 4096
  val RestBits = 36
  private val RestMask = (1L << RestBits) - 1
  /** α_m · m² for m = 4096, inlined identically in the SQL replay. */
  val AlphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  /** First 48 bits of md5 of `s` as a non-negative long — the portable
    * hash every sketch consumer must feed (the m137 convention). */
  def hash48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Registers: one (groupCols…, bucket, rho) row per hit bucket —
    * max(rho) partial-aggregates map-side, so the exchange is bounded
    * by groups × 2^12 integer rows whatever the corpus size. */
  def registers(rows: DataFrame, groupCols: Seq[String],
                hash48Col: Column): DataFrame = {
    val rest = hash48Col.bitwiseAND(lit(RestMask))
    val rho = when(rest === 0L, lit(RestBits + 1))
      .otherwise(lit(RestBits + 1) - length(bin(rest)))
    rows
      .select(groupCols.map(col) :+
        shiftright(hash48Col, RestBits).as("bucket") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Union of sketches by POINTWISE REGISTER MAX — the merge that makes
    * HLL the 100 TB distinct-count: per-partition/per-source/per-day
    * sketches combine into any coarser scope without touching the data
    * again, because max is associative, commutative and idempotent
    * (spec-pinned: merging per-group register tables is EXACTLY the
    * register table of the unioned input, so the merged estimate is
    * bit-identical to a from-scratch build). `keepCols` is the coarser
    * grouping retained (empty = one global sketch). */
  def merge(regs: DataFrame, keepCols: Seq[String] = Seq.empty): DataFrame =
    regs.groupBy(keepCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Per-group estimate over a register table: (groupCols…,
    * registers_hit, hll_estimate). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("registers_hit"),
        sum(pow(lit(2.0), -col("rho"))).as("sp"))
    val sumPow = col("sp") + (lit(M) - col("registers_hit")).cast("double")
    val raw = lit(AlphaM2) / sumPow
    val v = lit(M.toLong) - col("registers_hit")
    val est = when(raw <= lit(2.5 * M) && v > 0L,
        lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
      .otherwise(raw)
    agg.select(groupCols.map(col) :+ col("registers_hit") :+
      est.as("hll_estimate"): _*)
  }
}
