package graft.similarity

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-stage retrieval — the standard billion-scale ANN serving shape:
  * a compressed index (IVF-PQ) nominates a small candidate set per query,
  * then the candidates' RAW vectors are fetched and re-ranked by exact
  * cosine. ADC distances are quantized (codebook resolution), so their
  * top-k ordering is approximate even when the true neighbor is among the
  * candidates; the re-rank stage restores exact ordering over whatever the
  * first stage surfaced. Recall vs brute force is then bounded only by
  * candidate coverage (nprobe × candidate multiple), not by PQ resolution.
  *
  * Scale shape (100 TB):
  *  - stage 1 never touches raw vectors beyond the PQ codes (IvfPq.topK);
  *  - the candidate set is (queries × k·mult) rows — tiny — and is
  *    BROADCAST into the fetch join, so the raw-vector corpus streams
  *    once and only candidate rows survive the probe; with the corpus
  *    bucketed by id the fetch is a local lookup instead;
  *  - the exact re-rank then scores |candidates| pairs, not |corpus|.
  */
object Rerank {

  /** Exact-cosine top-k over a nominated candidate set.
    * `candidates`: (query_id, neighbor_id) from any ANN stage;
    * `queries`/`corpus`: (id, vec). Output matches Ann.bruteForceTopK:
    * (query_id, rank, neighbor_id, sim) — restricted to candidates. */
  def exactRerank(candidates: DataFrame, queries: DataFrame,
                  corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = corpus.sparkSession
    val q = queries
      .withColumn("qnrm", sqrt(GraftFunctions.dot(spark, col("vec"), col("vec"))))
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("qnrm"))
    val cand = candidates.select("query_id", "neighbor_id").distinct()
    val fetched = corpus
      .join(broadcast(cand), corpus("id") === cand("neighbor_id"))
      .withColumn("nrm", sqrt(GraftFunctions.dot(spark, col("vec"), col("vec"))))
    val scored = fetched.join(broadcast(q), Seq("query_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (GraftFunctions.dot(spark, col("qvec"), col("vec")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** IVF-PQ candidates (k·candMult per query, nprobe cells) re-ranked to
    * exact top-k. `queries`/`corpus`: (id, vec); `encoded`: IvfPq.encode
    * of the corpus under `model`. */
  def ivfPqRerank(queries: DataFrame, corpus: DataFrame, encoded: DataFrame,
                  model: IvfPq.Model, k: Int, nprobe: Int,
                  candMult: Int = 5): DataFrame = {
    require(candMult >= 1, "candMult must be >= 1")
    val cands = IvfPq.topK(queries, encoded, model, k * candMult, nprobe)
      .select("query_id", "neighbor_id")
    exactRerank(cands, queries, corpus, k)
  }
}
