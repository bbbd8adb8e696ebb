package graft.queries

import graft.SparkSpec
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.functions._

/** The corpus-proportional sizing knobs (scaledNlist for quantizer cells,
  * scaledPlanes for sign-LSH buckets) only ever see their FLOORED values
  * at driver scale factors — the first change is above 8k vectors (nlist)
  * / 128k vectors (planes). This spec crosses both thresholds with
  * synthetic corpora so the round-10 scale fix (fixed bucket count ⇒
  * linear occupancy growth ⇒ quadratic in-bucket work) can't regress
  * unobserved: above the floor the knobs must actually grow, occupancy
  * must stay near the target, and near-dup recall must survive the
  * larger bucket space. */
class ScaledKnobsSpec extends SparkSpec {
  import spark.implicits._

  test("knob formulas: floors hold below threshold, growth starts above it") {
    // nlist: floored at 16 through 8192 vectors, then n/512, capped 8192
    CorpusQueries.scaledNlist(1000) shouldBe 16
    CorpusQueries.scaledNlist(8192) shouldBe 16
    CorpusQueries.scaledNlist(20000) shouldBe 39
    CorpusQueries.scaledNlist(300000) shouldBe 585
    CorpusQueries.scaledNlist(100000000L) shouldBe 8192
    // planes: floored at 8 through 128k vectors, then ceil(log2(n/512))
    CorpusQueries.scaledPlanes(5000) shouldBe 8
    CorpusQueries.scaledPlanes(131072) shouldBe 8
    CorpusQueries.scaledPlanes(300000) shouldBe 10
    CorpusQueries.scaledPlanes(1000000) shouldBe 11
  }

  /** Deterministic gaussian-ish corpus: n vectors of `dim` doubles. */
  private def synthCorpus(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian())))
  }

  test("scaled planes above the floor: occupancy stays near target; planted near-dups still collide") {
    val n = 300000
    val dim = 8
    val base = synthCorpus(n, dim, seed = 31)
    val df = base.toDF("id", "vec").repartition(8)
    val planes = CorpusQueries.scaledPlanes(n)
    planes should be > 8 // genuinely above the floor

    // Occupancy: with the scaled plane count, mean bucket occupancy must
    // sit at/below the ~512 target; at the FLOOR it would be ~4x that —
    // the exact linear-growth trap the knob closes.
    def meanOcc(p: Int): Double = {
      val hp = Ann.hyperplanes(p, dim)
      val occ = df.select(Ann.bucketId(col("vec"), hp).as("b"))
        .groupBy("b").count().agg(avg("count")).head().getDouble(0)
      occ
    }
    val scaledOcc = meanOcc(planes)
    val floorOcc = meanOcc(8)
    scaledOcc should be <= 512.0
    scaledOcc should be < floorOcc / 2.0

    // Recall: 25 planted near-dup pairs (last-dim +0.05, the fixture
    // perturbation) must still share a (table, bucket) in >= 1 of the 3
    // OR tables at the LARGER plane count — growing the bucket space
    // must not break candidate generation.
    val planted = base.take(25).map { case (id, v) =>
      (id + n, v.init :+ (v.last + 0.05))
    }
    val pairVecs = (base.take(25) ++ planted).toDF("id", "vec")
    val tables = (0 until 3).map(t =>
      Ann.hyperplanes(planes, dim, seed = 42L + t))
    val buckets = pairVecs.select(col("id"),
        array(tables.map(hp => Ann.bucketId(col("vec"), hp)): _*).as("bs"))
      .as[(Long, Seq[Long])].collect().toMap
    val collided = (0 until 25).count { i =>
      buckets(i.toLong).zip(buckets(i.toLong + n)).exists { case (a, b) => a == b }
    }
    collided should be >= 23 // >= 92% of planted pairs remain candidates
  }

  test("scaled nlist above the floor: quantizer spreads and cell occupancy stays bounded") {
    val n = 20000
    val dim = 8
    val df = synthCorpus(n, dim, seed = 57).toDF("id", "vec").repartition(8)
    val nlist = CorpusQueries.scaledNlist(n)
    nlist should be > 16 // above the floor (= 39 at 20k)
    val model = Ivf.train(df, nlist = nlist, iters = 2)
    val cells = df.select(Ivf.cellId(col("vec"), model).as("c"))
      .groupBy("c").count().as[(Int, Long)].collect()
    // the quantizer actually uses the larger cell space...
    cells.length should be > nlist / 2
    // ...and no cell degenerates into a linear-growth hot spot: max
    // occupancy within a small factor of the n/nlist mean.
    val mean = n.toDouble / nlist
    cells.map(_._2).max.toDouble should be < mean * 5.0
  }
}
