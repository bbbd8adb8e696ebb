package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive: given two
  * snapshots of a keyed table, classify every key as added / removed /
  * changed / unchanged by comparing a content fingerprint. This is what an
  * incremental ingest reads to decide re-embedding/re-tokenizing work
  * (only `added`+`changed`), and what a dataset release audit reports.
  *
  * Scale shape (100 TB):
  *  - the fingerprint is computed BEFORE the join, so the full-outer
  *    exchange carries (key, 16-byte hash) — never the document text;
  *  - one shuffle per side on the key, sort-merge full-outer join; with
  *    both snapshots bucketed by key on disk (the layout an incremental
  *    pipeline would keep anyway) the exchanges vanish entirely;
  *  - output is row-per-key; the usual consumer filters `status IN
  *    ('added','changed')`, which pushes straight into the join's
  *    null-handling (no second pass).
  *
  * Precondition: keys are unique within each snapshot (run exact dedup
  * m04 first) — a duplicated key would fan out through the join.
  */
object SnapshotDiff {

  /** Diff two snapshots on `keyCol`, fingerprinting each row with
    * `fingerprint` (default: md5 of the null-coalesced `text` column).
    * Output: (key, old_fp, new_fp, status). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
           fingerprint: Column = md5(coalesce(col("text"), lit("")))): DataFrame = {
    val o = oldSnap.select(col(keyCol), fingerprint.as("old_fp"))
    val n = newSnap.select(col(keyCol), fingerprint.as("new_fp"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }
}
