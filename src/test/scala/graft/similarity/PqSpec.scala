package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins product quantization against the exact baseline: recall@k vs
  * brute-force cosine top-k, planted-duplicate retrieval, code bounds,
  * training determinism, and the 32× storage contract. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // Clustered 16-dim corpus (8 centers, unit-normalized) — the regime PQ
  // is built for; pure-random directions would test noise, not recall.
  private lazy val corpus = {
    val rng = new scala.util.Random(17)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    (0L until 200L).map { i =>
      val c = centers((i % 8).toInt)
      val v = c.map(_ + rng.nextGaussian() * 0.15)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(_ / n).toSeq)
    }.toDF("id", "vec")
  }

  test("codes are m ints in [0, ksub) — the compressed-store contract") {
    val model = Pq.train(corpus, m = 4, ksub = 16, iters = 3)
    model.m shouldBe 4
    model.ksub shouldBe 16
    model.dsub shouldBe 4
    val codes = Pq.encode(corpus, model).collect()
    codes.length shouldBe 200
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      cs.length shouldBe 4 // 4 bytes/vector at ksub=16 vs 64 floats raw
      all(cs) should (be >= 0 and be < 16)
    }
  }

  test("training is deterministic (hash-ordered sample, ordinal seeding)") {
    Pq.train(corpus, 4, 16, iters = 3) shouldBe Pq.train(corpus, 4, 16, iters = 3)
  }

  test("ADC recall@5 vs brute-force cosine is high on clustered data") {
    // m=8/ksub=64 (2-dim subspaces): the resolution needed to rank
    // WITHIN-cluster neighbors, whose true distances sit near the
    // quantization noise floor — the hard case for PQ by construction.
    val model = Pq.train(corpus, m = 8, ksub = 64, iters = 8)
    val codes = Pq.encode(corpus, model)
    val queries = corpus.filter($"id" < 10)
    val got10 = Pq.adcTopK(queries, codes, model, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Recall5@10 (the FAISS reporting convention: true top-5 retrieved
    // within depth 10) — ADC ranks by reconstructed distance, so exact
    // rank order inside a tight cluster is noise-floor-limited, but the
    // true neighbors must surface at shallow depth.
    val at10 = (got10 intersect want).size.toDouble / want.size
    at10 should be >= 0.9
    // Strict recall@5 stays bounded too — the quantizer is usable as-is.
    val strict = (Pq.adcTopK(queries, codes, model, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      intersect want).size.toDouble / want.size
    strict should be >= 0.6
  }

  test("a planted exact duplicate achieves every query's minimum ADC distance") {
    val dups = corpus.filter($"id" < 5)
      .select(($"id" + 1000L).as("id"), $"vec")
    val aug = corpus.unionByName(dups)
    val model = Pq.train(aug, m = 8, ksub = 32, iters = 5)
    val codes = Pq.encode(aug, model)
    val top = Pq.adcTopK(corpus.filter($"id" < 5), codes, model, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    (0L until 5L).foreach { q =>
      val rows = top(q)
      val dup = rows.find(_._2 == q + 1000L)
      // An identical vector gets identical codes, so its ADC distance is
      // the query's OWN reconstruction error — the provable minimum over
      // all corpus codes (each table term is the subspace argmin). It is
      // small but NOT zero: ADC never decodes, it compares q against
      // reconstructions.
      dup should not be empty
      dup.get._3 shouldBe rows.map(_._3).min
      dup.get._3 should be < 0.1
    }
  }

  test("per-partition heap merge equals a single-partition scan") {
    val model = Pq.train(corpus, 4, 16, iters = 3)
    val q = corpus.filter($"id" < 3)
    val many = Pq.adcTopK(q, Pq.encode(corpus.repartition(13), model), model, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = Pq.adcTopK(q, Pq.encode(corpus.coalesce(1), model), model, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    many shouldBe one
  }

  test("dim not divisible by m fails loudly") {
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "vec")
    an[IllegalArgumentException] should be thrownBy Pq.train(bad, m = 2, ksub = 2)
  }
}
