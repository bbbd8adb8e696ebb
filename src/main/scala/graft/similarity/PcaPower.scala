package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction by distributed power iteration
  * (m63) — the dimensionality-reduction / whitening primitive the
  * embedding tier lacked next to clipping ([[Winsorize]]) and
  * quantization ([[ScalarQuantizer]], [[Pq]]): the dominant direction of
  * an embedding corpus is what you inspect for "rogue dimension"
  * pathologies (a single dimension carrying batch-norm drift), subtract
  * for anisotropy correction (all-but-the-top), or whiten before cosine
  * retrieval.
  *
  * Computes v ← normalize( Σ_i (x_i−μ) ((x_i−μ)·v) ) for a fixed
  * iteration count from a deterministic all-ones start — the classic
  * power method on the covariance WITHOUT materializing the d×d
  * covariance (only d-sized vectors ever exist anywhere).
  *
  * Scale shape (100 TB):
  *  - the mean and each iteration are ONE corpus pass each: the dot
  *    product (x−μ)·v runs inside the row against a BROADCAST v (a
  *    64-double closure literal), and the scaled-vector sum partial-aggs
  *    map-side through a posexplode to (dim, partial) — the exchange
  *    carries partitions × d rows, never vectors;
  *  - driver state per iteration is d doubles (the new v) — same
  *    bounded-model contract as [[Ivf.train]]'s centroids;
  *  - at 100 TB you would subsample the training pass like [[Pq]] does;
  *    the full-corpus pass here is the exact flavor, same shape.
  *
  * Oracle: the first `iterations − 1` normalize-between-iterations
  * steps are driver-state recursion (spec-pinned by PcaPowerSpec:
  * planted-direction recovery, the analytic 2-d eigenpair, sign
  * convention, eigenvalue = explained variance) — but the FINAL
  * iteration is one corpus-wide pass of plain arithmetic. Capturing
  * (μ, v_{k−1}) at the top of the last step lets
  * [[graft.OracleModelSql.pcaTopComponent]] replay that pass in DuckDB
  * with the state inlined as literals — the same captured-model recipe
  * as the IVF/PQ search paths (training spec-pinned, the full-data pass
  * hash-checked).
  */
object PcaPower {

  /** Driver state entering the final power iteration: the per-dimension
    * mean and the unit iterate v_{k−1} — everything the last pass needs. */
  final case class IterState(mu: Seq[Double], v: Seq[Double])

  /** (dim, loading, eigenvalue): the unit top component (sign fixed so
    * the first nonzero loading is positive) and its eigenvalue (the
    * variance explained along it, computed in a final pass). */
  def topComponent(vecs: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   iterations: Int = 8,
                   captureKey: Option[String] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val spark = vecs.sparkSession
    import spark.implicits._
    val xs = vecs.select(Vectors.toDouble(col(vecCol)).as("x"))
      .filter(col("x").isNotNull)

    // One pass: per-dimension mean.
    val comps = xs.select(posexplode(col("x")).as(Seq("dim", "v")))
    val meanRows = comps.groupBy("dim").agg(avg(col("v")).as("m"))
      .orderBy("dim").as[(Int, Double)].collect()
    val d = meanRows.length
    require(d > 0, "empty input")
    val mu = meanRows.map(_._2)

    def centered(muB: Array[Double]) = {
      val muCol = array(muB.map(lit(_)).toIndexedSeq: _*)
      zip_with(col("x"), muCol, (a, b) => a - b)
    }

    // Pin the centered corpus once: every iteration re-reads this
    // projection, not the source lineage.
    val xc = xs.select(centered(mu).as("xc")).localCheckpoint(true)
    val n = xc.count().toDouble

    // Power iterations: v <- sum_i xc * (xc . v), normalized on the driver.
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var eigen = 0.0
    for (it <- 1 to iterations) {
      if (it == iterations)
        captureKey.foreach(k =>
          graft.OracleCapture.put(k, IterState(mu.toSeq, v.toSeq)))
      val vCol = array(v.map(lit(_)).toIndexedSeq: _*)
      val sums = xc
        .withColumn("dp", aggregate(zip_with(col("xc"), vCol, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x))
        .select(posexplode(transform(col("xc"), c => c * col("dp")))
          .as(Seq("dim", "c")))
        .groupBy("dim").agg(sum(col("c")).as("s"))
        .orderBy("dim").as[(Int, Double)].collect().map(_._2)
      val norm = math.sqrt(sums.map(x => x * x).sum)
      // Rayleigh quotient of the PREVIOUS (unit) v: λ ≈ v·(C v) = v·sums/n.
      eigen = sums.zip(v).map { case (s, vi) => s * vi }.sum / n
      v = if (norm == 0.0) v else sums.map(_ / norm)
    }
    // Deterministic sign: first loading with |.| > 1e-12 made positive.
    val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    val signed = if (lead < 0) v.map(-_) else v

    signed.zipWithIndex
      .map { case (l, i) => (i.toLong, l, eigen) }.toSeq
      .toDF("dim", "loading", "eigenvalue")
  }
}
