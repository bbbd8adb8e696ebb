package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, matching how production vector pipelines scale:
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the query set.
  *    Correctness baseline; O(queries × corpus) but the corpus side streams
  *    — right answer whenever the query set is small.
  *  - [[lshTopK]]: random-hyperplane LSH — each vector gets a sign-bit
  *    bucket from a fixed set of hyperplanes; only same-bucket pairs are
  *    scored. This bounds the scored pairs, turning the cross product into
  *    an equi-join shuffle on bucket id; recall is tunable via `planes`
  *    (fewer planes → bigger buckets → higher recall, more compute).
  *
  * Hyperplanes are generated from a fixed seed on the driver and inlined as
  * literal arrays: deterministic, no fit/persist step needed for a
  * stateless batch engine.
  */
object Ann {

  /** Exact top-k neighbors per query vector. `queries` and `corpus` both
    * have (id, vec double[]). Self-matches are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec"))))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        Vectors.cosine(col("qvec"), col("vec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic random hyperplanes: `planes` rows of `dim` doubles. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def bucketId(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(Vectors.dot(vec, plane) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only same-bucket candidates. Returns the same
    * schema as bruteForceTopK; ranks are within retrieved candidates, so
    * recall < 1 by design. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(numPlanes, dim, seed)
    val qb = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      bucketId(col("vec"), hp).as("bucket"))
    val cb = corpus.select(col("id"), col("vec"), bucketId(col("vec"), hp).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        Vectors.cosine(col("qvec"), col("vec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, doc_a < doc_b.
    * LSH-bucketed so only same-bucket pairs are scored (the 100 TB path);
    * with numPlanes=0 it degrades to the exact all-pairs check. */
  def nearDupPairs(vectors: DataFrame, threshold: Double,
                   numPlanes: Int = 0, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val base =
      if (numPlanes <= 0) {
        val a = vectors.select(col("id").as("doc_a"), col("vec").as("vec_a"))
        val b = vectors.select(col("id").as("doc_b"), col("vec").as("vec_b"))
        a.join(b, col("doc_a") < col("doc_b"))
      } else {
        val hp = hyperplanes(numPlanes, dim, seed)
        val bucketed = vectors.select(col("id"), col("vec"),
          bucketId(col("vec"), hp).as("bucket"))
        bucketed.select(col("bucket"), col("id").as("doc_a"), col("vec").as("vec_a"))
          .join(bucketed.select(col("bucket"), col("id").as("doc_b"), col("vec").as("vec_b")),
            Seq("bucket"))
          .filter(col("doc_a") < col("doc_b"))
      }
    base.select(col("doc_a"), col("doc_b"),
        Vectors.cosine(col("vec_a"), col("vec_b")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
