package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[IvfPq.topKBatch]] — the distributed batch-retrieval path — and
  * the serving paths' probe-bound contract:
  *  - batch ≡ serving row-for-row (bit-identical adist) on the same
  *    inputs, including at a WHOLE-CORPUS probe set, the workload the
  *    serving path's driver-built LUTs exist to bound against;
  *  - [[IvfPq.topK]] and [[Pq.adcTopK]] reject probe sets beyond
  *    [[IvfPq.MaxServingProbes]] loudly instead of OOMing the driver. */
class IvfPqBatchSpec extends SparkSpec {
  import spark.implicits._

  // Same clustered corpus family as IvfPqSpec: 8 unit-norm centers, 16 dims.
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

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("batch path returns exactly the serving path's rows") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model)
    val queries = corpus.filter($"id" < 25)
    val serving = rows(IvfPq.topK(queries, enc, model, k = 5, nprobe = 3))
    val batch = rows(IvfPq.topKBatch(queries, enc, model, k = 5, nprobe = 3))
    batch shouldBe serving // bit-identical adist included
    batch should not be empty
  }

  test("whole-corpus probe set: the k-NN graph matches serving row-for-row") {
    // 240 probes = every vector — the batch workload. Still under the
    // serving bound here, so the serving path can produce the expected
    // rows; at production probe counts only topKBatch runs.
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model)
    val serving = rows(IvfPq.topK(corpus, enc, model, k = 3, nprobe = 2))
    val batch = rows(IvfPq.topKBatch(corpus, enc, model, k = 3, nprobe = 2))
    batch shouldBe serving
    batch.map(_._1) shouldBe (0L until 240L).toSet // every probe answered
  }

  test("serving paths reject probe sets beyond MaxServingProbes") {
    val model = IvfPq.train(corpus, nlist = 8, m = 8, ksub = 16)
    val enc = IvfPq.encode(corpus, model)
    val huge = spark.range(IvfPq.MaxServingProbes + 1)
      .select(col("id"), array(Seq.fill(16)(lit(0.1)): _*).cast("array<double>").as("vec"))
    val e1 = intercept[IllegalArgumentException] {
      IvfPq.topK(huge, enc, model, k = 3, nprobe = 2)
    }
    e1.getMessage should include("topKBatch")
    val pq = Pq.train(corpus, m = 8, ksub = 16)
    val codes = Pq.encode(corpus, pq)
    val e2 = intercept[IllegalArgumentException] {
      Pq.adcTopK(huge, codes, pq, k = 3)
    }
    e2.getMessage should include("topKBatch")
  }
}
