package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stored BM25 inverted-index asset (m112) — the lexical tier's version
  * of [[graft.similarity.AnnAssets]]: tokenize + aggregate the corpus
  * ONCE per corpus fingerprint, persist the postings, and give every
  * later retrieval a term-pruned parquet scan instead of a corpus
  * re-tokenization. This is the search-engine topology (index build vs
  * serve) the fresh [[Bm25.topK]] path deliberately is not: fresh is
  * right for a one-shot query batch (one corpus pass either way),
  * stored is right when query batches RECUR against a slowly-changing
  * corpus — at 100 TB the tokenize+aggregate pass is the expensive
  * part, and the asset layer already solves staleness (corpus
  * fingerprint), crash-safe publication and cross-process reuse.
  *
  * Two co-published assets, keyed by the documents fingerprint:
  *  - `bm25post`: (doc_id, term, tf, dl) postings, range-sharded and
  *    sorted by (term, doc_id) — term-clustered storage, so a probe for
  *    a query's terms touches few row groups (parquet min/max skipping
  *    on the leading sort column), the annenc cell-clustering argument
  *    at term granularity;
  *  - `bm25stats`: the 1-row (n_docs, sum_dl) corpus stats — stored
  *    separately because zero-token docs count in N/avgdl but have no
  *    posting rows to recover them from.
  *
  * df is NOT stored: document frequency over term-pruned postings
  * equals global df for those terms (pruning by term drops no posting
  * of a kept term), so serving derives it from the pruned scan — one
  * fewer asset to keep consistent. */
object Bm25Assets {

  /** Stored (postings, stats) for `dir`'s documents table. */
  def index(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = graft.Tables.documents(s, dir)
    val post = graft.pipeline.DedupAssets.materialized(
      s, "bm25post", dir, Seq("term", "doc_id"),
      fpTable = "documents.parquet", fpCols = Seq("doc_id", "text")) {
      Bm25.postings(docs)
    }
    val stats = graft.pipeline.DedupAssets.materialized(
      s, "bm25stats", dir, Seq("n_docs"),
      fpTable = "documents.parquet", fpCols = Seq("doc_id", "text")) {
      Bm25.corpusStats(docs)
    }
    (post, stats)
  }
}
