package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax sampling allocation (Chung et al. 2023, "UniMax: Fairer and
  * More Effective Language Sampling for Large-Scale Multilingual
  * Pretraining", ICLR — public): distribute a total token budget across
  * sources as UNIFORMLY as possible subject to a per-source epoch cap —
  * the waterfilling answer to the temperature-sampling dial (m34).
  * Temperature sampling over-weights the head and over-epochs the tail;
  * UniMax gives every source the same allocation τ except sources whose
  * entire capacity (n_tokens · epochCap) sits below the waterline, which
  * contribute everything they have.
  *
  * The waterline: sort sources by capacity ascending; source i saturates
  * iff its capacity ≤ the fair share of the budget left after every
  * smaller source contributed its full capacity; the first non-saturated
  * source's fair-share level IS τ (saturation is monotone down the sort —
  * once a source exceeds its level, every later level is strictly
  * smaller). If the budget exceeds total capacity, every source
  * saturates and the budget is simply under-filled.
  *
  * Scale shape (100 TB): the input is already the per-source aggregate —
  * source-count-sized (dozens of rows at worst), so the rank window, the
  * scalar broadcasts and the waterline join are all bounded by the
  * number of SOURCES, never the corpus. The one corpus-sized pass is the
  * caller's token-count aggregation feeding `sizes`.
  *
  * Determinism: capacities are n_tokens · epochCap (exact doubles for
  * any corpus below 2⁵² tokens per source), the prefix walk runs in the
  * (capacity, source) total order inside one window frame, and every
  * derived double is the same left-associated expression the DuckDB
  * oracle computes — bit-identical cross-engine.
  */
object UniMax {

  /** Allocate `budgetFrac` of the corpus's total tokens across sources,
    * capping every source at `epochCap` passes over its data. `sizes`
    * must carry (source, n_tokens); other columns ride through. Output
    * adds: budget (the same on every row), capacity, alloc, epochs
    * (= alloc / n_tokens), saturated (1 iff the source contributes its
    * full capacity). Empty input → empty output. */
  def allocateFrac(sizes: DataFrame, budgetFrac: Double,
                   epochCap: Double): DataFrame = {
    require(budgetFrac > 0.0, "budgetFrac must be positive")
    require(epochCap > 0.0, "epochCap must be positive")
    // The plan references `sizes` four times (totals, rank walk, waterline
    // scalar, final projection) — without a pin each reference would
    // recompute the caller's corpus-sized aggregation chain. Eager
    // snapshot, same contract as MinHashLSH/PrefixSum; the pinned frame
    // is source-count-sized.
    val sized = graft.Snapshot.SnapshotOps(sizes).pinned(true)
    val totals = sized.agg(
      floor(sum("n_tokens").cast("double") * lit(budgetFrac)).as("budget"),
      count(lit(1)).as("k"))
    val ord = Window.orderBy(col("capacity"), col("source"))
    // source-count-sized frame: the rank window's single partition holds
    // one row per source, not per document
    val ranked = sized
      .withColumn("capacity", col("n_tokens").cast("double") * lit(epochCap))
      .crossJoin(broadcast(totals))
      .withColumn("idx", row_number().over(ord))
      .withColumn("prefix", coalesce(
        sum(col("capacity")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("level",
        (col("budget") - col("prefix")) / (col("k") - col("idx") + 1).cast("double"))
      .withColumn("saturated", (col("capacity") <= col("level")).cast("long"))
    // τ = the FIRST non-saturated source's level; levels strictly decrease
    // past that point, so max() over the non-saturated rows selects it
    val tau = ranked.filter(col("saturated") === 0L)
      .agg(max(col("level")).as("tau"))
    ranked.crossJoin(broadcast(tau))
      .withColumn("alloc",
        when(col("saturated") === 1L, col("capacity"))
          .otherwise(coalesce(col("tau"), col("capacity"))))
      .withColumn("epochs", col("alloc") / col("n_tokens").cast("double"))
      .drop("k", "idx", "prefix", "level", "tau")
  }
}
