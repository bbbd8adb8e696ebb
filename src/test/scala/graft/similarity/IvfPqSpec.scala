package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the composed IVF-PQ index: full-probe recall vs brute force (PQ
  * resolution alone), partial-probe behavior (cell coverage), residual
  * encoding quality, planted-duplicate retrieval, and determinism. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // Same clustered corpus family as PqSpec: 8 unit-norm centers, 16 dims.
  private lazy val corpus = {
    val rng = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    (0L until 240L).map { i =>
      val c = centers((i % 8).toInt)
      val v = c.map(_ + rng.nextGaussian() * 0.15)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(_ / n).toSeq)
    }.toDF("id", "vec")
  }

  test("encoded schema: one cell + m residual codes per vector") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model).collect()
    enc.length shouldBe 240
    enc.foreach { r =>
      r.getInt(1) should (be >= 0 and be < 8)
      val codes = r.getSeq[Int](2)
      codes.length shouldBe 8
      all(codes) should (be >= 0 and be < 16)
    }
  }

  test("full probing: Recall5@10 vs brute force is PQ-resolution-limited only") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 64, pqIters = 8)
    val enc = IvfPq.encode(corpus, model)
    val queries = corpus.filter($"id" < 10)
    val got = IvfPq.topK(queries, enc, model, k = 10, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ((got intersect want).size.toDouble / want.size) should be >= 0.9
  }

  test("nprobe=1 scans only the query's own cell") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model)
    val cellOf = enc.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = IvfPq.topK(corpus.filter($"id" === 0), enc, model, k = 20, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    res should not be empty
    all(res.map(cellOf)) shouldBe cellOf(0L)
  }

  test("a planted duplicate lands in the same cell with identical codes and min adist") {
    val dups = corpus.filter($"id" < 5).select(($"id" + 1000L).as("id"), $"vec")
    val aug = corpus.unionByName(dups)
    val model = IvfPq.train(aug, nlist = 8, m = 8, ksub = 64, pqIters = 8)
    val enc = IvfPq.encode(aug, model)
    val byId = enc.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    (0L until 5L).foreach { q => byId(q + 1000L) shouldBe byId(q) }
    val top = IvfPq.topK(corpus.filter($"id" < 5), enc, model, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).groupBy(_._1)
    (0L until 5L).foreach { q =>
      val rows = top(q)
      val dup = rows.find(_._2 == q + 1000L)
      dup should not be empty
      dup.get._3 shouldBe rows.map(_._3).min
    }
  }

  test("residual codebooks beat raw-space codebooks at equal budget") {
    // The point of encoding residuals: same m×ksub budget, finer
    // resolution. Compare mean ADC error |adist − true dist²| over the
    // brute-force top-5 pairs, IVF-PQ(residual) vs plain PQ(raw).
    val queries = corpus.filter($"id" < 10)
    val truth = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id", "sim")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), 2.0 - 2.0 * r.getDouble(2)))
      .toMap // unit-norm: dist² = 2 − 2·cos
    def meanErr(adists: Map[(Long, Long), Double]): Double = {
      val common = truth.keySet intersect adists.keySet
      common.toSeq.map(k => math.abs(adists(k) - truth(k))).sum / common.size
    }
    val ivfpq = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16, pqIters = 5)
    val a = IvfPq.topK(queries, IvfPq.encode(corpus, ivfpq), ivfpq, k = 20, nprobe = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val pq = Pq.train(corpus, m = 8, ksub = 16, iters = 5)
    val b = Pq.adcTopK(queries, Pq.encode(corpus, pq), pq, k = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    meanErr(a) should be < meanErr(b)
  }

  test("training is deterministic") {
    IvfPq.train(corpus, 8, 4, 16) shouldBe IvfPq.train(corpus, 8, 4, 16)
  }
}
