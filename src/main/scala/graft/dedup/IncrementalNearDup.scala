package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-duplicate admission (m72) — the crawl-time shape:
  * a NEW batch probes the inverted shingle index of the corpus already
  * admitted, producing only (batch, indexed) pairs — never batch×batch
  * or index×index. [[graft.operators.QuotaSample]]-era m29 answers
  * "exact duplicate of something admitted?"; this answers the near-dup
  * version of the same admission question, which is how dedup actually
  * runs in production: nobody re-pairs 100 TB on every ingest — the
  * daily batch (GBs) probes the standing index.
  *
  * Gram walk, stop-gram cap and jaccard arithmetic are [[NgramJaccard]]'s
  * (one shared tokenization; FNV-hashed grams count like the oracle's
  * string replay up to 2^-64 collisions). The df cap applies to the
  * INDEX postings — a viral boilerplate gram never materializes its
  * posting list ([[graft.functions.CappedCollect]] bounds the buffer),
  * and the index doc's set size is counted over KEPT grams, mirroring
  * m14's denominator convention.
  *
  * Scale shape (100 TB): the index's postings exchange is amortizable
  * (persist it bucketed by gram between ingests); per batch, only the
  * batch's grams shuffle — batch-sized, not corpus-sized — and the pair
  * space is bounded by dfCap × batch grams.
  */
object IncrementalNearDup {

  /** (batch_id, index_id, jaccard) for batch docs whose kept-gram
    * jaccard against an indexed doc reaches `threshold`. */
  def probeIndex(batch: DataFrame, indexed: DataFrame,
                 textCol: String = "text", w: Int = 3,
                 threshold: Double = 0.6, dfCap: Int = 50): DataFrame = {
    val bGrams = batch.select(col("doc_id").as("batch_id"),
      explode(NgramJaccard.wordShingleHashSet(col(textCol), lit(w))).as("gram"))
    val iGrams = indexed.select(col("doc_id").as("index_id"),
      explode(NgramJaccard.wordShingleHashSet(col(textCol), lit(w))).as("gram"))
    val postings = iGrams.groupBy("gram")
      .agg(graft.functions.CappedCollect.cappedIds(dfCap)(col("index_id")).as("ids"))
      .filter(col("ids").isNotNull)
    val nB = bGrams.groupBy("batch_id").agg(count(lit(1)).as("n_b"))
    val nI = postings.select(explode(col("ids")).as("index_id"))
      .groupBy("index_id").agg(count(lit(1)).as("n_i"))
    val inter = bGrams.join(postings, Seq("gram"))
      .select(col("batch_id"), explode(col("ids")).as("index_id"))
      .groupBy("batch_id", "index_id").agg(count(lit(1)).as("shared"))
    inter
      .join(nB, Seq("batch_id"))
      .join(nI, Seq("index_id"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_b") + col("n_i") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "index_id", "jaccard")
  }
}
