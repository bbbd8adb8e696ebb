package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** Materialized dedup assets — the production topology for the near-dup
  * pair graph and its cluster labels.
  *
  * A curation pipeline verifies near-dup pairs ONCE and stores them; every
  * downstream consumer (centrality ranking, keep-best resolution,
  * leakage-safe splits) reads the stored artifact instead of re-shingling
  * the corpus and re-verifying pairs. Before this layer the suite paid the
  * pair-graph build ~5× per run (m14, m17, m62, m66, m70 each rebuilt it)
  * — per-query the plan was fine, but at 100 TB "recompute the dedup graph
  * per report" is the wrong topology: the pair table is the expensive,
  * slowly-changing asset; the reports are cheap reads over it.
  *
  * Shape: each asset is written exactly once per (asset, corpus) per JVM —
  * range-sharded, internally sorted parquet via
  * [[graft.io.Sinks.writeSortedShards]] (disjoint ordered key ranges, the
  * layout a downstream merge-reader wants) — and every consumer gets a
  * plain parquet scan of the stored file. The shard count is a policy
  * knob: 8 covers the test scales; a production deployment sizes it from
  * the pair-table bytes (pairs are two longs + a double per row, orders of
  * magnitude smaller than the corpus).
  *
  * The memo is per-JVM on purpose: re-runs of the process rebuild the
  * asset from source (no cross-run staleness when operator semantics
  * change); within a run — one Bench/Verify sweep, one test suite — the
  * build cost is paid once. Reads use the schema captured at write time,
  * so an empty asset (no near-dup pairs at all) round-trips instead of
  * failing parquet schema inference.
  */
object DedupAssets {

  private case class Asset(path: String, schema: StructType)
  private val cache = mutable.Map.empty[String, Asset]
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-dedup-assets").toString

  /** Materialize `build` once per (asset, key) per JVM as sorted-shard
    * parquet; always return a reader over the stored copy. */
  def materialized(s: SparkSession, asset: String, key: String,
                   sortCols: Seq[String])(build: => DataFrame): DataFrame = {
    val a = synchronized {
      cache.getOrElseUpdate(s"$asset::$key", {
        val df = build
        val path = s"$root/$asset-${java.lang.Integer.toHexString(key.hashCode)}"
        graft.io.Sinks.writeSortedShards(df, path, numShards = 8, sortCols)
        Asset(path, df.schema)
      })
    }
    s.read.schema(a.schema).parquet(a.path)
  }

  /** Verified near-dup pairs (doc_a, doc_b, jaccard) over the augmented
    * `documents` corpus of `dir` — m14's inverted-index verification, run
    * once and stored. */
  def pairs(s: SparkSession, dir: String): DataFrame =
    materialized(s, "pairs", dir, Seq("doc_a", "doc_b"))(
      graft.queries.CorpusQueries.gramIndexJaccard(s, dir))

  /** Cluster labels (doc_id, cluster_id) — connected components over the
    * stored pair asset, themselves stored once. */
  def clusters(s: SparkSession, dir: String): DataFrame =
    materialized(s, "clusters", dir, Seq("doc_id"))(
      graft.dedup.DedupClusters.components(
        pairs(s, dir).select("doc_a", "doc_b")))

  /** Test hook: drop the memo so a spec can observe a fresh build. The
    * written files stay on disk (temp dir); only the mapping is dropped. */
  def reset(): Unit = synchronized { cache.clear() }
}
