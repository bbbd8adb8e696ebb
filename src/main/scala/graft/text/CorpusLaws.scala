package graft.text

import graft.operators.PrefixSum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Snapshot.SnapshotOps

/** Corpus-law fit (m57): one-row report of how closely the corpus obeys
  * Zipf's law (term frequency vs rank) and Heaps' law (vocabulary growth
  * vs corpus size) — the two sanity dials a data-curation run reads
  * before trusting downstream token-budget and vocabulary decisions. A
  * corpus whose Zipf slope drifts far from -1, or whose Heaps exponent
  * collapses, is usually template-spam or a broken extraction step.
  *
  * Both laws are ordinary least squares in log-log space, computed from
  * ONE pass of moment sums (n, Σx, Σy, Σxx, Σxy, Σyy) so the fit itself
  * is a partial-aggregable reduction — no point materializes anywhere.
  *
  * Scale shape (100 TB):
  *  - the token stream is exploded ONCE: both laws derive from the same
  *    (source, term, c) table — global tf is `sum(c)` over term, the
  *    Heaps points are `sum(c)` / `count(1)` over source. That table is
  *    checkpoint-pinned rather than left to AQE stage reuse, because the
  *    Zipf branch consumes it through PrefixSum's eager side jobs while
  *    the Heaps branch runs in the final query — separate executions,
  *    which a stage cache cannot span (the groupBy-term / groupBy-source
  *    pair used to re-scan and re-explode the corpus once each);
  *  - the token stream collapses map-side to that table before anything
  *    global happens; text never shuffles;
  *  - the global frequency rank uses [[PrefixSum.exclusiveRunningTotalsBy]]
  *    (range-partition by (tf DESC, term), per-partition counts to the
  *    driver, broadcast offsets) — NOT `row_number() OVER (ORDER BY ...)`,
  *    whose empty partitionBy funnels the whole vocabulary through one
  *    task;
  *  - Heaps' points are per-source (tokens, distinct-terms) pairs — one
  *    partial-aggregated exchange on source;
  *  - the two 1-row moment frames cross-join at the driver. Total: three
  *    small exchanges, none carrying text.
  *
  * The OLS formulas are written with explicit association
  * ((n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)) and mirrored token-for-token in
  * the DuckDB oracle, so both engines run the identical float expression
  * tree over sums that agree to ~1e-15.
  */
object CorpusLaws {

  /** One row: (n_tokens, n_types, zipf_slope, zipf_intercept, zipf_r2,
    * heaps_beta, heaps_logk, heaps_r2). Tokenization matches the rest of
    * the text tier: lower, trim, split on runs of spaces, drop empties. */
  def lawsReport(docs: DataFrame): DataFrame = {
    val terms = docs.filter(col("text").isNotNull)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), " +")).as("term"))
      .filter(col("term") =!= "")
    // The single corpus-wide pass both laws re-aggregate. Checkpoint-pinned
    // because the Zipf branch consumes it through PrefixSum's EAGER side
    // jobs while the Heaps branch runs in the final query — two separate
    // executions, so AQE's stage cache can never share the exchange between
    // them; only a materialized snapshot can. The operator is already eager
    // (PrefixSum's contract), and the snapshot is vocabulary-sized
    // ((source, term, c) — the text itself never leaves the map side), so
    // this pins the small table, not the corpus. Same release policy as
    // PrefixSum: Bench/Verify unpersist snapshots between queries.
    val st = terms.groupBy("source", "term").agg(count(lit(1)).as("c"))
      .pinned(true)

    // Zipf: y = ln(tf) against x = ln(rank), rank = global position in
    // (tf DESC, term ASC) order — unique, hence deterministic.
    val tf = st.groupBy("term").agg(sum(col("c")).as("tf"))
      .withColumn("one", lit(1L))
    val ranked = PrefixSum
      // pinInput = false: tf is one cheap aggregation over the pinned st
      // snapshot, so re-evaluating it for the range sketch is cheaper
      // than materializing a second vocabulary-sized snapshot.
      .exclusiveRunningTotalsBy(tf, Seq(col("tf").desc, col("term").asc), "one",
        pinInput = false)
      .withColumn("rk", (col("running") + lit(1L)).cast("double"))
    val zx = log(col("rk"))
    val zy = log(col("tf").cast("double"))
    val zipf = ranked.agg(
      count(lit(1)).cast("double").as("zn"),
      sum(zx).as("zsx"), sum(zy).as("zsy"),
      sum(zx * zx).as("zsxx"), sum(zx * zy).as("zsxy"),
      sum(zy * zy).as("zsyy"),
      sum(col("tf")).as("total_tokens"))

    // Heaps: y = ln(distinct terms) against x = ln(tokens), one point per
    // source (V = K·N^beta  ⇒  ln V = ln K + beta·ln N).
    val perSource = st.groupBy("source").agg(
      sum(col("c")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("nv"))
    val hx = log(col("nt"))
    val hy = log(col("nv"))
    val heaps = perSource.agg(
      count(lit(1)).cast("double").as("hn"),
      sum(hx).as("hsx"), sum(hy).as("hsy"),
      sum(hx * hx).as("hsxx"), sum(hx * hy).as("hsxy"),
      sum(hy * hy).as("hsyy"))

    // Degenerate fits (zero variance in x or y — e.g. every source sees the
    // identical vocabulary) yield NULL, not an ANSI divide-by-zero error;
    // the oracle mirrors this with nullif(denominator, 0.0).
    def sdiv(num: Column, den: Column): Column =
      when(den === 0.0, lit(null).cast("double")).otherwise(num / den)
    def slope(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column): Column =
      sdiv(n * sxy - sx * sy, n * sxx - sx * sx)
    def intercept(n: Column, sx: Column, sy: Column, sl: Column): Column =
      (sy - sl * sx) / n
    def r2(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column, syy: Column): Column =
      sdiv((n * sxy - sx * sy) * (n * sxy - sx * sy),
        (n * sxx - sx * sx) * (n * syy - sy * sy))

    val zSlope = slope(col("zn"), col("zsx"), col("zsy"), col("zsxx"), col("zsxy"))
    val hSlope = slope(col("hn"), col("hsx"), col("hsy"), col("hsxx"), col("hsxy"))
    zipf.crossJoin(heaps).select(
      col("total_tokens").cast("long").as("n_tokens"),
      col("zn").cast("long").as("n_types"),
      zSlope.as("zipf_slope"),
      intercept(col("zn"), col("zsx"), col("zsy"), zSlope).as("zipf_intercept"),
      r2(col("zn"), col("zsx"), col("zsy"), col("zsxx"), col("zsxy"), col("zsyy"))
        .as("zipf_r2"),
      hSlope.as("heaps_beta"),
      intercept(col("hn"), col("hsx"), col("hsy"), hSlope).as("heaps_logk"),
      r2(col("hn"), col("hsx"), col("hsy"), col("hsxx"), col("hsxy"), col("hsyy"))
        .as("heaps_r2"))
  }
}
