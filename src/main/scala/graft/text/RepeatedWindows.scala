package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document repeated-sequence detection — the "dedup long repeated
  * substrings" signal (Lee et al. 2022, public) at token-window
  * granularity: a W-token window whose fingerprint appears in ≥ `minDocs`
  * DISTINCT documents marks a span that should be cut or down-weighted
  * before training. Window granularity (stride 1) is what exact-substring
  * dedup needs that document dedup (m03), line dedup (m31) and winnowing
  * (m23, sampled fingerprints) don't give: every repeated run ≥ W tokens
  * is covered by at least one flagged window, wherever it starts.
  *
  * Scale shape (100 TB):
  *  - window texts exist only inside a per-document codegen projection
  *    (transform over the token array); what leaves the document is the
  *    md5 fingerprint — the frequency exchange carries (fp, doc) pairs,
  *    never window text;
  *  - per-doc DISTINCT before the count (a document repeating its own
  *    boilerplate must not self-promote it to "repeated");
  *  - the flagged-fp set joins back by fp — an equi-join AQE broadcasts
  *    when small and shuffles when not (same policy as [[LineDedup]]);
  *  - output is (doc_id, window_idx, fp) spans, bounded by the true
  *    repetition mass, so downstream span-merging stays proportional to
  *    what will actually be cut.
  *
  * md5 (not xxhash64) so the DuckDB oracle replays the identical
  * fingerprints — the engine-portability contract every dedup operator
  * here follows.
  */
object RepeatedWindows {

  /** Windows of `w` tokens (stride 1) whose fingerprint occurs in ≥
    * `minDocs` distinct documents: (doc_id, window_idx, fp). Documents
    * shorter than `w` tokens contribute their whole text as one window —
    * short exact duplicates still flag (same policy as the n-gram ops). */
  def flag(docs: DataFrame, w: Int, minDocs: Int = 2,
           textCol: String = "text"): DataFrame = {
    require(w > 0, "w must be positive")
    require(minDocs > 1, "minDocs must be > 1 (1 flags every window)")
    val toks = split(lower(trim(col(textCol))), " +")
    val windows = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        when(size(col("t")) <= w, array(array_join(col("t"), " ")))
          .otherwise(transform(
            sequence(lit(0), size(col("t")) - w),
            i => array_join(slice(col("t"), i + 1, lit(w)), " "))).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("window_idx", "wtext")))
      .select(col("doc_id"), col("window_idx").cast("long").as("window_idx"),
        md5(col("wtext").cast("binary")).as("fp"))
    val repeated = windows
      .select("fp", "doc_id").distinct()
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("fp")
    windows.join(repeated, Seq("fp"))
      .select("doc_id", "window_idx", "fp")
  }
}
