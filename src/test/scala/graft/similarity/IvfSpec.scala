package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated clusters around (±10, 0) plus noise dims.
  private lazy val vecs = {
    val rng = new scala.util.Random(1)
    (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i, Seq(base + rng.nextGaussian() * 0.1, rng.nextGaussian() * 0.1,
        rng.nextGaussian() * 0.1, rng.nextGaussian() * 0.1))
    }.toDF("id", "vec")
  }

  test("train separates obvious clusters and assigns coherently") {
    val model = Ivf.train(vecs, nlist = 2, iters = 3)
    model.nlist shouldBe 2
    val cells = vecs.select($"id", Ivf.cellId($"vec", model).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // all even ids together, all odd ids together, in different cells
    val evenCells = cells.filter(_._1 % 2 == 0).values.toSet
    val oddCells = cells.filter(_._1 % 2 == 1).values.toSet
    evenCells.size shouldBe 1
    oddCells.size shouldBe 1
    evenCells should not equal oddCells
  }

  test("IVF top-k with full probing equals brute force") {
    val model = Ivf.train(vecs, nlist = 2, iters = 2)
    val queries = vecs.filter($"id" < 2)
    val ivf = Ivf.topK(queries, vecs, model, k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val brute = Ann.bruteForceTopK(queries, vecs, k = 3)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    ivf shouldBe brute
  }

  test("plan stays bounded at production nlist (no inlined literal centroids)") {
    val rng = new scala.util.Random(7)
    val model = Ivf.Model(Seq.fill(256)(Seq.fill(16)(rng.nextGaussian())))
    val df = Seq((1L, Seq.fill(16)(0.1))).toDF("id", "vec")
    val assigned = df.select($"id", Ivf.cellId($"vec", model).as("c"),
      Ivf.probeCells($"vec", model, 8).as("probes"))
    // The centroid matrix rides the scoring closure, not the plan: the
    // literal-per-centroid form at 256×16 is ~100k chars of expression
    // tree (and grows linearly with nlist); the closure form stays O(1).
    assigned.queryExecution.optimizedPlan.toString.length should be < 2000
    val row = assigned.collect().head
    row.getInt(1) should (be >= 0 and be < 256)
    row.getSeq[Int](2).length shouldBe 8
  }

  test("train at nlist=64 is one aggregation per iter and frees its sample") {
    val rng = new scala.util.Random(11)
    val big = (0L until 600L).map(i => (i, Seq.fill(8)(rng.nextGaussian())))
      .toDF("id", "vec")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val model = Ivf.train(big, nlist = 64, iters = 2)
    (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before) shouldBe empty
    model.nlist shouldBe 64
    val cells = big.select(Ivf.cellId($"vec", model).as("c")).as[Int].collect()
    all(cells) should (be >= 0 and be < 64)
    cells.distinct.length should be > 32 // the quantizer actually spreads
  }

  test("trainCap bounds the sample deterministically") {
    val rng = new scala.util.Random(13)
    val big = (0L until 500L).map(i => (i, Seq.fill(4)(rng.nextGaussian())))
      .toDF("id", "vec")
    val a = Ivf.train(big, nlist = 4, iters = 2, trainCap = 100)
    val b = Ivf.train(big, nlist = 4, iters = 2, trainCap = 100)
    a shouldBe b // hash-ordered sample → reproducible model
    val full = Ivf.train(big, nlist = 4, iters = 2)
    full.nlist shouldBe 4
  }

  test("nprobe=1 searches only the query's own cluster") {
    val model = Ivf.train(vecs, nlist = 2, iters = 2)
    val queries = vecs.filter($"id" === 0) // even cluster
    val res = Ivf.topK(queries, vecs, model, k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    all(res.map(_ % 2)) shouldBe 0L // only even-cluster neighbors retrieved
  }
}
