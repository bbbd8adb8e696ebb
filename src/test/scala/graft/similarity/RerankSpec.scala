package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two-stage retrieval contract: exact re-rank over a full
  * candidate set IS brute force; re-ranking IVF-PQ candidates never hurts
  * recall vs the raw ADC ordering; sims are exact cosine. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    (0L until 240L).map { i =>
      val c = centers((i % 8).toInt)
      val v = c.map(_ + rng.nextGaussian() * 0.15)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(_ / n).toSeq)
    }.toDF("id", "vec")
  }
  private lazy val queries = corpus.filter($"id" < 10)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("re-ranking the full corpus as candidates reproduces brute force exactly") {
    val allCands = queries.select(col("id").as("query_id"))
      .crossJoin(corpus.select(col("id").as("neighbor_id")))
    val got = Rerank.exactRerank(allCands, queries, corpus, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Ann.bruteForceTopK(queries, corpus, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    got shouldBe want
  }

  test("IVF-PQ + re-rank recall is >= raw ADC recall, both vs brute force") {
    val model = IvfPq.train(corpus, nlist = 8, m = 4, ksub = 8, pqIters = 4)
    val enc = IvfPq.encode(corpus, model)
    val want = pairs(Ann.bruteForceTopK(queries, corpus, k = 5))
    val adc = pairs(IvfPq.topK(queries, enc, model, k = 5, nprobe = 8))
    val rr = pairs(Rerank.ivfPqRerank(queries, corpus, enc, model,
      k = 5, nprobe = 8, candMult = 5))
    val adcRecall = (adc intersect want).size.toDouble / want.size
    val rrRecall = (rr intersect want).size.toDouble / want.size
    rrRecall should be >= adcRecall
    rrRecall should be >= 0.9 // full probing: only candidate truncation left
  }

  test("re-ranked sims are exact cosine (match brute-force values)") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model)
    val bf = Ann.bruteForceTopK(queries, corpus, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val rr = Rerank.ivfPqRerank(queries, corpus, enc, model,
      k = 5, nprobe = 8, candMult = 4).collect()
    rr should not be empty
    rr.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bf.get(key).foreach(_ shouldBe r.getDouble(3) +- 1e-12)
    }
  }

  test("k and the candidate multiple bound the output") {
    val model = IvfPq.train(corpus, nlist = 8, m = 4, ksub = 8)
    val enc = IvfPq.encode(corpus, model)
    val out = Rerank.ivfPqRerank(queries, corpus, enc, model,
      k = 3, nprobe = 2, candMult = 2)
    val counts = out.groupBy("query_id").count().select("count").as[Long].collect()
    all(counts) should be <= 3L
    out.select("rank").as[Long].collect().foreach(_ should be <= 3L)
  }

  test("the candidate fetch broadcasts candidates, not the corpus") {
    val model = IvfPq.train(corpus, nlist = 8, m = 4, ksub = 8)
    val enc = IvfPq.encode(corpus, model)
    val plan = Rerank.ivfPqRerank(queries, corpus, enc, model,
      k = 3, nprobe = 2, candMult = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }
}
