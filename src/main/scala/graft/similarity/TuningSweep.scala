package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN tuning sweep (m74) — the recall-vs-nprobe curve for an IVF index,
  * what FAISS exposes as ParameterSpace: before anyone serves an
  * approximate index, they read this table to pick the cheapest nprobe
  * that clears the recall bar. Recall@k is measured against the exact
  * brute-force top-k on the same queries, per nprobe setting.
  *
  * Scale shape: the exact baseline is computed ONCE (bounded probe set —
  * [[Ann.bruteForceTopK]]'s broadcast-queries contract) and each sweep
  * point is one [[Ivf.topK]] run; recalls reduce per (nprobe, query)
  * then average — sweep cost is linear in the number of settings, and
  * at 100 TB the sweep runs on a sampled query set, same shape.
  *
  * No oracle by design: the IVF index internals (k-means cells) aren't
  * SQL; TuningSweepSpec pins monotone recall in nprobe, the full-probe
  * ≡ exact endpoint (recall 1.0 — with every cell probed, IVF scores
  * the identical candidate set with the identical exact distances), and
  * the output contract.
  */
object TuningSweep {

  /** (nprobe, k, n_queries, mean_recall): recall@k of IVF retrieval vs
    * the exact top-k, averaged over the query set, one row per tested
    * nprobe (ascending). */
  def ivfRecallCurve(queries: DataFrame, corpus: DataFrame, model: Ivf.Model,
                     k: Int, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1), "nprobes must be >= 1")
    val spark = corpus.sparkSession
    val exact = Ann.bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val nQ = queries.count()
    val perSetting = nprobes.sorted.map { np =>
      val approx = Ivf.topK(queries, corpus, model, k, nprobe = np)
        .select(col("query_id"), col("neighbor_id"))
      // per-query overlap with the exact set, then mean over ALL queries
      // (a query with no approx hits contributes 0 through the left join)
      val hits = exact.join(approx.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((coalesce(sum(col("hit")), lit(0L)).cast("double") /
          count(lit(1))).as("recall"))
      val mean = hits.agg(sum(col("recall"))).collect()(0).getDouble(0) / nQ
      (np.toLong, k.toLong, nQ, mean)
    }
    import spark.implicits._
    perSetting.toDF("nprobe", "k", "n_queries", "mean_recall")
  }
}
