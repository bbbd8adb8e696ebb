package graft.pipeline

import graft.dedup.{DedupClusters, ExactDedup, NgramJaccard}
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Snapshot.SnapshotOps

/** The end-to-end training-data preparation flow, composed from the
  * engine's corpus operators — what a 100 TB pretraining pipeline actually
  * runs, as ONE dataflow:
  *
  *   quality/language gate → exact dedup → near-dup pair mining →
  *   dedup clustering → canonical-doc selection → sliding-window chunking
  *
  * Every stage is relational, so the whole composite is hash-checked
  * end-to-end against a single DuckDB oracle (m18) — the strongest
  * correctness statement the engine makes: not just each operator alone,
  * but their composition, down to chunk text.
  *
  * Scale notes per stage are on the operators themselves; composing them
  * adds no new shuffles beyond their own (the gate and chunker are pure
  * projections/generates; dedup stages exchange fingerprints, posting
  * hashes and id pairs — never document text).
  */
object CorpusPipeline {

  /** `snapshot = false` skips the mid-pipeline localCheckpoint so the whole
    * dataflow stays ONE inspectable plan — PlanSpec uses it to pin that no
    * exchange carries document text (a checkpoint truncates the plan into
    * a LogicalRDD scan, hiding the upstream exchanges from assertion).
    * Production callers keep the default: the deduped set feeds three
    * consumers and must not recompute per consumer. */
  def prepare(docs: DataFrame, lang: String = "en", minQuality: Double = 0.3,
              jaccardThreshold: Double = 0.6, dfCap: Int = 50,
              chunkSize: Int = 50, chunkStride: Int = 40,
              snapshot: Boolean = true): DataFrame = {
    val gated = docs
      .select(col("doc_id"), col("text"), TextOps.profile(col("text")).as("p"))
      .filter(col("p.lang_pred") === lang && col("p.quality") >= minQuality)
      .select("doc_id", "text")
    // The deduped set feeds three consumers (pair mining, the canonical
    // anti-join, and chunking) — checkpoint it once instead of re-running
    // the profile UDF + fingerprint semi-join per consumer. Lazy: it
    // materializes with the first downstream action. Lifetime contract:
    // the snapshot's blocks live as long as the returned frame is in use;
    // long-lived sessions must release them once the result is consumed
    // (Bench/Verify unpersist all snapshots between queries — queries
    // share no state, so anything still pinned is dead weight).
    val deduped = ExactDedup.dedup(gated)
    val exact = if (snapshot) deduped.pinned(false) else deduped
    val pairs = NgramJaccard
      .invertedIndexPairs(exact, threshold = jaccardThreshold, dfCap = dfCap)
      .select("doc_a", "doc_b")
    val nonCanonical = DedupClusters.components(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val canon = exact.join(nonCanonical, Seq("doc_id"), "left_anti")
    TextOps.chunk(canon, size = chunkSize, stride = chunkStride)
  }

  /** [[prepare]] extended with the scrub tier:
    *
    *   gate → PII redaction → repetition collapse → exact dedup →
    *   near-dup cluster → canonical → chunk
    *
    * Stage order is load-bearing: scrubbing runs BEFORE exact dedup
    * because per-document PII (emails, IPs, phone numbers embedded in
    * otherwise-identical boilerplate) differs doc to doc, so unscrubbed
    * exact dedup would miss true content duplicates — after redaction the
    * variance collapses to identical `<EMAIL>`/`<IP>`/`<PHONE>`
    * placeholders and the copies fingerprint identically (spec-pinned).
    * Both scrub stages are pure projections, so v2 adds ZERO shuffles
    * over [[prepare]]. Hash-checked end-to-end as m28.
    */
  def prepareV2(docs: DataFrame, lang: String = "en", minQuality: Double = 0.3,
                jaccardThreshold: Double = 0.6, dfCap: Int = 50,
                chunkSize: Int = 50, chunkStride: Int = 40,
                snapshot: Boolean = true): DataFrame = {
    // Each scrub stage lands in its own projection so the collapse lambda
    // references an ATTRIBUTE, not the upstream expression tree — see
    // Repetition.collapseTokens' contract (inlining the chain re-runs the
    // triple-regex scrub once per token).
    val gated = docs
      .select(col("doc_id"), col("text"), TextOps.profile(col("text")).as("p"))
      .filter(col("p.lang_pred") === lang && col("p.quality") >= minQuality)
      .select(col("doc_id"),
        graft.text.PiiRedact.redactedText(col("text")).as("text"))
      .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("t"))
      .select(col("doc_id"),
        graft.text.Repetition.collapseTokens(col("t")).as("text"))
    val deduped = ExactDedup.dedup(gated)
    val exact = if (snapshot) deduped.pinned(false) else deduped
    val pairs = NgramJaccard
      .invertedIndexPairs(exact, threshold = jaccardThreshold, dfCap = dfCap)
      .select("doc_a", "doc_b")
    val nonCanonical = DedupClusters.components(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val canon = exact.join(nonCanonical, Seq("doc_id"), "left_anti")
    TextOps.chunk(canon, size = chunkSize, stride = chunkStride)
  }
}
