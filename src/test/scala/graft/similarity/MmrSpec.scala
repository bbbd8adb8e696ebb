package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*): DataFrame =
    rows.toDF("id", "vec")

  /** Deterministic pseudo-random unit-ish vectors. */
  private def corpus(n: Int, dim: Int = 8): DataFrame = {
    val rng = new scala.util.Random(7)
    vecs((0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian()))): _*)
  }

  test("lambda = 1 degenerates to exact brute-force top-k") {
    val all = corpus(60)
    val q = all.filter($"id" < 3)
    val got = Mmr.mmrTopK(q, all, k = 5, lambda = 1.0)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val want = Ann.bruteForceTopK(q, all, k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    got shouldBe want
  }

  test("the first pick is always the plain top-1, for any lambda") {
    val all = corpus(40)
    val q = all.filter($"id" < 3)
    for (lambda <- Seq(0.0, 0.3, 0.7)) {
      val first = Mmr.mmrTopK(q, all, k = 4, lambda = lambda)
        .filter($"rank" === 1).select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toMap
      val top1 = Ann.bruteForceTopK(q, all, k = 1)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toMap
      first shouldBe top1
    }
  }

  test("a redundant near-copy is demoted below a diverse result") {
    // query q = e0. Candidates: 10/11 nearly identical, both closest to q;
    // 12 less relevant but orthogonal to them. Plain top-2 = {10, 11};
    // MMR(0.5) must pick 12 second, because 11 pays sim(11,10) ≈ 1.
    val q = vecs(0L -> Seq(1.0, 0.0, 0.0))
    val cands = vecs(
      10L -> Seq(0.99, 0.10, 0.00),
      11L -> Seq(0.99, 0.11, 0.00),
      12L -> Seq(0.60, 0.00, 0.80))
    val plain = Ann.bruteForceTopK(q, cands, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    plain shouldBe Set(10L, 11L)
    val mmr = Mmr.mmrTopK(q, cands, k = 2, lambda = 0.5)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    mmr shouldBe Seq(10L, 12L)
  }

  test("ranks are contiguous from 1, k results per query, sims are true cosines") {
    val all = corpus(50)
    val out = Mmr.mmrTopK(all.filter($"id" < 4), all, k = 5, lambda = 0.6)
      .as[(Long, Long, Long, Double, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).sorted.toSeq shouldBe (1L to 5L)
    }
    // spot-check one sim against brute force's value for the same pair
    val bf = Ann.bruteForceTopK(all.filter($"id" < 4), all, k = 50)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    out.foreach { case (q, _, n, sim, _) =>
      sim shouldBe bf((q, n)) +- 1e-12
    }
  }

  test("selection never leaves the candidate pool (candMult bound)") {
    val all = corpus(100)
    val out = Mmr.mmrTopK(all.filter($"id" < 2), all, k = 3, lambda = 0.0,
      candMult = 2)
    // pool = top-6 by sim; even at lambda 0 every pick must come from it
    val pool = Ann.bruteForceTopK(all.filter($"id" < 2), all, k = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    out.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach(p => pool should contain(p))
  }
}
