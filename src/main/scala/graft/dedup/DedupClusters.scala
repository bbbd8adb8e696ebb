package graft.dedup

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the final stage of a
  * production dedup pipeline: pairwise verdicts (from MinHash/SimHash/
  * inverted-index verification) become clusters, and one canonical
  * document (the min doc_id) represents each cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round, a node takes the minimum label among itself
  * and its neighbors; stop when a round changes nothing. A component of
  * diameter d converges in ≤ d rounds — near-dup components are
  * overwhelmingly tiny (pairs/triangles from template families), so 2-3
  * rounds settle real corpora, and `maxIters` caps adversarial chains.
  *
  * Scale shape per round: one shuffle of the (edge ⋈ label) join keyed on
  * doc_id and one min-aggregate — label rows are two longs, document text
  * never moves. The fixpoint check is an aggregate scalar (`changed`
  * count), not a collect. This is the standard large-graph CC recipe
  * (hash-to-min); at 100 TB of docs the edge set from verified pairs is
  * orders of magnitude smaller than the corpus.
  *
  * Memory contract: each round's lineage is truncated with a
  * localCheckpoint, whose blocks stay pinned until explicitly
  * unpersisted — a long-lived session would otherwise accumulate one
  * dead label snapshot per round per invocation. `components` therefore
  * frees every intermediate snapshot (edges + all superseded rounds) as
  * soon as its successor materializes, returning a frame backed by
  * exactly ONE small snapshot of (long, long) labels. Callers that can
  * scope the result's lifetime should prefer `withComponents`, which
  * also frees that final snapshot on exit — leaving ZERO persisted RDDs
  * behind (spec-asserted via sc.getPersistentRDDs).
  */
object DedupClusters {

  /** Snapshot `df` eagerly and return the frame plus the pinned-RDD
    * handles for [[graft.Snapshot.free]] — local blocks by default,
    * durable checkpoint files when `spark.graft.checkpointDir` is set
    * (the cluster fault-tolerance mode; see [[graft.Snapshot]]). */
  private def snapshot(df: DataFrame): (DataFrame, Seq[RDD[_]]) =
    graft.Snapshot.pinTracked(df, eager = true)

  private def free(rdds: Seq[RDD[_]]): Unit = graft.Snapshot.free(rdds)

  /** (doc_id, cluster_id) for every document that appears in `pairs`
    * (doc_a, doc_b); cluster_id = min doc_id of the component.
    *
    * The result is backed by one materialized snapshot (two longs per
    * clustered doc). Use `withComponents` to release it deterministically
    * when the consumption is scoped. */
  def components(pairs: DataFrame, maxIters: Int = 10): DataFrame =
    componentsOwned(pairs, maxIters)._1

  /** Run `f` over the component labels, then free the final snapshot too:
    * net persisted-RDD delta is zero. `f` must fully consume the frame —
    * the labels are not usable after the bracket returns. */
  def withComponents[T](pairs: DataFrame, maxIters: Int = 10)(
      f: DataFrame => T): T = {
    val (labels, owned) = componentsOwned(pairs, maxIters)
    try f(labels) finally free(owned)
  }

  private def componentsOwned(
      pairs: DataFrame, maxIters: Int): (DataFrame, Seq[RDD[_]]) = {
    // Symmetric edge list, materialized ONCE: every round re-reads the
    // edges, and without the checkpoint each reference would re-execute
    // the entire upstream pair-verification pipeline (measured 4× the
    // query cost at sf0.1).
    val (edges, edgesRdds) = snapshot(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct())
    var (labels, labelsRdds) = snapshot(
      edges.select(col("src").as("doc_id"))
        .distinct()
        .withColumn("cluster_id", col("doc_id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // New label = min(own label, neighbors' labels).
      val (next, nextRdds) = snapshot(edges
        .join(labels.withColumnsRenamed(
          Map("doc_id" -> "dst", "cluster_id" -> "nbr_label")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_label")).as("nbr_min"))
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"),
          least(col("cluster_id"), col("nbr_min")).as("cluster_id"),
          (col("nbr_min") < col("cluster_id")).as("changed")))
      converged = next.filter(col("changed")).limit(1).isEmpty
      if (converged) {
        // Fixpoint: `next` carries the same labels as `labels` (nothing
        // changed) — the last snapshot is redundant, drop it and keep
        // the previous round as the result.
        free(nextRdds)
      } else {
        free(labelsRdds) // superseded round — nothing references it now
        labels = next.select("doc_id", "cluster_id")
        labelsRdds = nextRdds
      }
      i += 1
    }
    free(edgesRdds)
    // A silent cap would return intermediate labels that LOOK like
    // clusters but split long chains — fail loudly instead (components of
    // diameter > maxIters mean either raise maxIters or revisit the pair
    // threshold producing such chains).
    if (!converged) {
      free(labelsRdds)
      throw new IllegalStateException(
        s"label propagation did not converge within $maxIters rounds — " +
          "a near-dup component has diameter > maxIters; raise maxIters")
    }
    (labels, labelsRdds)
  }

  /** Dedup verdict per clustered doc: keep the canonical (min) member. */
  def canonical(pairs: DataFrame, maxIters: Int = 10): DataFrame =
    components(pairs, maxIters)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
}
