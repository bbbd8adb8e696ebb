package graft.similarity

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diversified retrieval: per query, pick
  * k results that are RELEVANT but not redundant — the re-rank that stops
  * a near-dup-heavy corpus answering every query with five copies of the
  * same document (Carbonell & Goldstein '98; the standard diversity pass
  * in RAG retrieval).
  *
  * Greedy selection over a bounded candidate pool:
  *   next = argmax over unpicked candidates of
  *     λ·sim(q, d) − (1−λ)·max over picked s of sim(d, s)
  * (ties → higher sim, then lower id; the first pick has no diversity
  * term, so it is always the plain top-1). λ=1 degenerates to exact
  * top-k; λ=0 maximizes spread.
  *
  * Scale shape: stage 1 nominates k·candMult candidates per query with
  * the exact broadcast-query scan (at 100 TB this would be the
  * [[IvfPq]] + [[Rerank]] index path — same contract, this exact form is
  * its verify baseline); stage 2 groups the ≤ k·candMult candidate rows
  * per query and runs the O(k²·candMult) greedy loop inside the group —
  * per-query state is bounded by construction, so the selection is an
  * embarrassingly-parallel mapGroups, never a driver loop. The candidate
  * exchange carries (query, candidate vec) rows only — k·candMult per
  * query, not the corpus.
  *
  * No oracle by design (the iterative argmax is not SQL); MmrSpec pins
  * the λ=1 degeneration to brute force, the top-1 invariant, and the
  * redundancy-demotion behavior on planted duplicates.
  */
object Mmr {

  // not `private`: the Dataset encoder's generated code instantiates these
  case class Cand(query_id: Long, neighbor_id: Long, sim: Double,
                  vec: Seq[Double])
  case class Pick(query_id: Long, rank: Long, neighbor_id: Long,
                  sim: Double, mmr_score: Double)

  /** Top-k diversified results per query: (query_id, rank, neighbor_id,
    * sim, mmr_score). `queries`/`corpus`: (id, vec double[]). */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int, lambda: Double,
              candMult: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nCand = k * candMult
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val scored = corpus.join(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (graft.functions.GraftFunctions.dot(spark, col("qvec"), col("vec")) /
          (sqrt(graft.functions.GraftFunctions.dot(spark, col("qvec"), col("qvec"))) *
            sqrt(graft.functions.GraftFunctions.dot(spark, col("vec"), col("vec"))))).as("sim"),
        col("vec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val cands: Dataset[Cand] = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= nCand)
      .select("query_id", "neighbor_id", "sim", "vec")
      .as[Cand]
    cands.groupByKey(_.query_id)
      .flatMapGroups { (qid, it) => select(qid, it.toArray, k, lambda) }
      .toDF()
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("sim"), col("mmr_score"))
  }

  /** The greedy MMR loop over one query's candidate pool. */
  private def select(qid: Long, pool: Array[Cand], k: Int,
                     lambda: Double): Iterator[Pick] = {
    val n = pool.length
    val vecs = pool.map(_.vec.toArray)
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    def cos(i: Int, j: Int): Double = {
      val a = vecs(i); val b = vecs(j)
      var s = 0.0; var t = 0
      val m = math.min(a.length, b.length)
      while (t < m) { s += a(t) * b(t); t += 1 }
      s / (norms(i) * norms(j))
    }
    val picked = new scala.collection.mutable.ArrayBuffer[Int]
    // maxSimToPicked(i) is maintained incrementally: one O(n) sweep per
    // pick instead of O(n·picked) rescans.
    val maxSimToPicked = Array.fill(n)(0.0)
    val used = Array.fill(n)(false)
    val out = new scala.collection.mutable.ArrayBuffer[Pick]
    var rank = 1L
    while (picked.length < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val div = if (picked.isEmpty) 0.0 else maxSimToPicked(i)
          val score = lambda * pool(i).sim - (1.0 - lambda) * div
          val better = score > bestScore ||
            (score == bestScore && best >= 0 &&
              (pool(i).sim > pool(best).sim ||
                (pool(i).sim == pool(best).sim &&
                  pool(i).neighbor_id < pool(best).neighbor_id)))
          if (best < 0 || better) { best = i; bestScore = score }
        }
        i += 1
      }
      used(best) = true
      picked += best
      out += Pick(qid, rank, pool(best).neighbor_id, pool(best).sim, bestScore)
      rank += 1
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val s = cos(j, best)
          if (s > maxSimToPicked(j)) maxSimToPicked(j) = s
        }
        j += 1
      }
    }
    out.iterator
  }
}
