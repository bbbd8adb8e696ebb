package graft.similarity

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into `nlist` cells; a query scores only
  * the `nprobe` nearest cells. The second scale path next to
  * [[Ann.lshTopK]] — IVF adapts to the data distribution where hyperplane
  * LSH is data-oblivious.
  *
  * The "model" is `nlist × dim` doubles of driver-side state (like any
  * fitted quantizer); training is Lloyd's algorithm on DataFrames — assign
  * via codegen'd dot products, update via per-dimension averages after a
  * posexplode, collect only the centroid matrix. Initialization is a
  * deterministic hash-ordered oversample refined by greedy farthest-point
  * selection (see [[train]]), so runs are reproducible and seeds spread.
  *
  * Scale shape: train touches the corpus `iters` times (each one shuffle
  * of (cell, dim, component)); search is one equi-join on cell id — the
  * cross product never materializes. Centroid averages are double sums, so
  * cell boundaries can move by ulps between partitionings — harmless for
  * ANN (it's approximate by contract), unlike the exact-query paths.
  */
object Ivf {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def nlist: Int = centroids.size
  }

  /** Per-centroid (distance-score, idx) structs — the ONE definition of
    * the quantizer distance, shared by assignment and probing (if these
    * diverged, corpus cells and query probes would disagree and recall
    * would silently collapse). d² = |v|² - 2·v·c + |c|²; |v|² is common to
    * all cells so the score uses (−2·v·c + |c|²) only. */
  private def scoredCells(vec: Column, model: Model): Seq[Column] = {
    val spark = org.apache.spark.sql.SparkSession.active
    model.centroids.zipWithIndex.map { case (c, i) =>
      val cArr = array(c.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * GraftFunctions.dot(spark, vec, cArr)).as("d"),
        lit(i).as("idx"))
    }
  }

  /** Squared-distance argmin cell id for a vector column. array_min over
    * (score, idx) structs picks the smallest lexicographically →
    * deterministic tie-break on idx. */
  def cellId(vec: Column, model: Model): Column =
    array_min(array(scoredCells(vec, model): _*)).getField("idx")

  /** `nprobe` nearest cell ids for a query vector (ascending distance). */
  def probeCells(vec: Column, model: Model, nprobe: Int): Column =
    transform(slice(array_sort(array(scoredCells(vec, model): _*)), 1, nprobe),
      s => s.getField("idx"))

  /** Squared euclidean distance (driver-side, init only). */
  private def dist2(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Greedy k-center (farthest-point) selection over a candidate pool —
    * deterministic, O(|pool|·k) on the driver. A plain random sample can
    * drop every seed into one dense cluster (and "empty cells keep their
    * centroid" then never separates them); farthest-point guarantees the
    * seeds spread across the pool's extent. */
  private def farthestPoints(pool: Seq[Seq[Double]], k: Int): Seq[Seq[Double]] = {
    if (pool.isEmpty || k <= 0) return Seq.empty
    val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
    val d2 = pool.map(v => dist2(v, pool.head)).toArray
    while (chosen.size < math.min(k, pool.size)) {
      var best = 0; var i = 1
      while (i < d2.length) { if (d2(i) > d2(best)) best = i; i += 1 }
      val next = pool(best)
      chosen += next
      i = 0
      while (i < d2.length) { d2(i) = math.min(d2(i), dist2(pool(i), next)); i += 1 }
    }
    chosen.toSeq
  }

  /** Lloyd's k-means over (id, vec double[]). Initialization: oversample
    * 4×nlist candidates by smallest xxhash64(id) — ONE TakeOrdered job
    * (per-partition heap + driver merge), no row count, no dense-id
    * assumption, fully reproducible — then greedy farthest-point selection
    * on the driver picks nlist spread seeds from the pool. */
  def train(vectors: DataFrame, nlist: Int, iters: Int = 3): Model = {
    val pool = vectors
      .orderBy(xxhash64(col("id")).asc, col("id").asc)
      .limit(nlist * 4)
      .select("vec").collect().map(_.getSeq[Double](0).toSeq).toSeq
    var model = Model(farthestPoints(pool, nlist))
    for (_ <- 1 to iters) {
      val assigned = vectors.select(col("vec"), cellId(col("vec"), model).as("cell"))
      val updated = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg("x").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // Empty cells keep their previous centroid.
      model = Model(model.centroids.zipWithIndex.map { case (c, i) =>
        updated.getOrElse(i, c)
      })
    }
    model
  }

  /** IVF top-k search: same schema as [[Ann.bruteForceTopK]]; recall is
    * bounded by nprobe/nlist coverage. */
  def topK(queries: DataFrame, corpus: DataFrame, model: Model, k: Int,
           nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus
      .withColumn("nrm", sqrt(GraftFunctions.dot(spark, col("vec"), col("vec"))))
      .withColumn("cell", cellId(col("vec"), model))
    val q = queries
      .withColumn("qnrm", sqrt(GraftFunctions.dot(spark, col("vec"), col("vec"))))
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("qnrm"),
        explode(probeCells(col("vec"), model, nprobe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (GraftFunctions.dot(spark, col("qvec"), col("vec")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
