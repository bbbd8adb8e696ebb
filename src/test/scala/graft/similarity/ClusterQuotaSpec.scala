package graft.similarity

import graft.SparkSpec
import graft.operators.QuotaSample
import org.apache.spark.sql.functions._

/** Shape-pins the m41 composition: Ivf cells → per-cell quota. The
  * components are each pinned by IvfSpec/QuotaSampleSpec; this checks the
  * composed contract — every semantic cluster survives the downsample. */
class ClusterQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("every populated cell keeps rows, none exceeds the cap") {
    val rng = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(8)(rng.nextGaussian() * 5))
    // Skewed cluster sizes: 100/60/30/10 — a count-based global cut would
    // gut the small cluster; the per-cell quota must not.
    val sizes = Seq(100, 60, 30, 10)
    val vecs = sizes.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map { i =>
        (c * 1000L + i, centers(c).map(_ + rng.nextGaussian() * 0.1).toSeq)
      }
    }.toDF("id", "vec")
    val model = Ivf.train(vecs, nlist = 8, iters = 3)
    val cells = vecs.select($"id", Ivf.cellId($"vec", model).as("cell"))
    val sampled = QuotaSample.quotaSample(cells, "cell", "id", cap = 10).collect()
    // Per-cell cap holds…
    sampled.groupBy(_.getAs[String]("cell")).values
      .foreach(_.length should be <= 10)
    // …and every semantic region survives the downsample (ids encode the
    // generating cluster as id/1000) — the property a count-based global
    // cut would break for the 10-row cluster.
    sampled.map(_.getAs[Long]("id") / 1000L).toSet shouldBe Set(0L, 1L, 2L, 3L)
    // The cut is real: the 200-row corpus actually shrank.
    sampled.length should be < 200
  }
}
