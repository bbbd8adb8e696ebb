package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-weighted source mixing — the `p_i ∝ n_i^α` sampling law
  * multilingual/multi-source LM training uses to up-weight small sources
  * without letting any source dominate (Arivazhagan et al. 2019's T5/mT5
  * convention; Raffel et al. 2020 §3.4.3 — public literature). α = 1
  * reproduces raw proportions, α = 0 is uniform; the production default
  * 0.3 sits between. The operator is the analytic companion to
  * [[UniMax]]: UniMax answers "budget under an epoch CAP", temperature
  * answers "budget under a smoothing EXPONENT" — mix dashboards show
  * both cards side by side.
  *
  * Determinism: the weight denominator Σ n_j^α is a DOUBLE sum, so it is
  * folded over the source-sorted collected list (sources-bounded — the
  * m95 bucket-sorted-fold discipline), never a partition-order float
  * aggregate; token totals are exact integer sums. Every derived double
  * is computed in a fixed operand order (weight = pow/denom, then
  * alloc = budget × weight, then epochs = alloc / n) so the DuckDB
  * replay agrees bit-for-bit.
  *
  * Scale shape: input is the per-source size table (already aggregated —
  * one corpus-sized exchange upstream, shared with the m100 fixture);
  * everything here is source-count-bounded: a 1-row totals aggregate
  * broadcast back onto the k source rows. Zero corpus-sized state.
  */
object TemperatureMix {

  /** (source, n_docs, n_tokens, p_raw, weight, budget, alloc_tokens,
    * epochs) — one row per source. `sizes` must carry (source, n_docs,
    * n_tokens). Sources with zero tokens get NULL epochs, and an all-zero
    * corpus gets NULL weight/p_raw/alloc_tokens too (the corpus-wide
    * /0 → null contract). */
  def allocate(sizes: DataFrame, alpha: Double = 0.3,
               budgetFrac: Double = 1.0): DataFrame = {
    val p = sizes.select(col("source"), col("n_docs"), col("n_tokens"),
      pow(col("n_tokens").cast("double"), lit(alpha)).as("pw"))
    val totals = p.agg(
      sum("n_tokens").as("tot"),
      aggregate(array_sort(collect_list(struct(col("source"), col("pw")))),
        lit(0.0), (acc, x) => acc + x.getField("pw")).as("denom"))
    val tot = col("tot").cast("double")
    // A corpus where EVERY source has zero tokens makes denom = Σ n^α = 0
    // and tot = 0: weight/p_raw/alloc are then null (the house /0 → null
    // convention, matching NeymanAlloc's zero-denominator case), never
    // NaN. A denom of 0 with any n_tokens > 0 is impossible (that
    // source's n^α > 0), so the guards only fire on the all-zero corpus.
    val weight = when(col("denom") > 0.0, col("pw") / col("denom"))
    val budget = floor(tot * budgetFrac).cast("long")
    val alloc = when(col("denom") > 0.0,
      budget.cast("double") * (col("pw") / col("denom")))
    p.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        when(tot > 0.0, col("n_tokens").cast("double") / tot).as("p_raw"),
        weight.as("weight"),
        budget.as("budget"),
        alloc.as("alloc_tokens"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(alloc / col("n_tokens").cast("double")).as("epochs"))
  }
}
