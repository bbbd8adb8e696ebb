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

  test("nprobe=1 searches only the query's own cluster") {
    val model = Ivf.train(vecs, nlist = 2, iters = 2)
    val queries = vecs.filter($"id" === 0) // even cluster
    val res = Ivf.topK(queries, vecs, model, k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    all(res.map(_ % 2)) shouldBe 0L // only even-cluster neighbors retrieved
  }
}
