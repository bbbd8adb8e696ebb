package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val D = 64
  private val K = 16

  private def embed(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def oneHot(i: Int): Seq[Float] =
    Seq.tabulate(D)(j => if (j == i) 1.0f else 0.0f)

  test("one-hot vectors preserve norm EXACTLY (±1/√16 entries square to 1/16)") {
    // For e_i: y_j = s(i,j)/4, so norm2_proj = 16 · 0.0625 = 1.0 — every
    // double in that chain is a power of two, so the ratio is exactly 1.
    val out = JlProjection.normCard(
      embed((0L until D.toLong).map(i => i -> oneHot(i.toInt)): _*), D, K)
      .collect()
    out should have length D.toLong.toInt
    out.foreach { r =>
      r.getAs[Double]("norm2_orig") shouldBe 1.0
      r.getAs[Double]("norm2_proj") shouldBe 1.0
      r.getAs[Double]("ratio") shouldBe 1.0
    }
  }

  test("scaling a vector by 2 scales both squared norms by exactly 4") {
    val v = Seq.tabulate(D)(i => (i % 7 - 3).toFloat)
    val out = JlProjection.normCard(
      embed(1L -> v, 2L -> v.map(_ * 2.0f)), D, K)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(2L).getAs[Double]("norm2_orig") shouldBe 4.0 * out(1L).getAs[Double]("norm2_orig")
    out(2L).getAs[Double]("norm2_proj") shouldBe 4.0 * out(1L).getAs[Double]("norm2_proj")
    out(2L).getAs[Double]("ratio") shouldBe out(1L).getAs[Double]("ratio")
  }

  test("zero vector carries a null ratio, not a division error") {
    val r = JlProjection.normCard(
      embed(9L -> Seq.fill(D)(0.0f)), D, K).collect()(0)
    r.getAs[Double]("norm2_orig") shouldBe 0.0
    r.getAs[Double]("norm2_proj") shouldBe 0.0
    r.isNullAt(r.fieldIndex("ratio")) shouldBe true
  }

  test("norm concentration on the real corpus: mean ratio near 1, spread bounded") {
    val out = graft.queries.CorpusQueries.jlNormCard(spark, sf("sf0.001"))
      .collect().map(_.getAs[Double]("ratio"))
    out.length should be > 0
    val mean = out.sum / out.length
    // E[ratio] = 1 over the sign draw; k = 16 gives sd ≈ √(2/16) ≈ 0.35
    // per vector, so the corpus mean sits tight around 1 and individual
    // ratios stay well inside the chi-square_16/16 bulk
    mean should (be >= 0.7 and be <= 1.3)
    out.foreach(_ should (be >= 0.05 and be <= 5.0))
  }

  test("the sign matrix is deterministic and balanced enough to be a real projection") {
    val signs = for (i <- 0 until D; j <- 0 until K) yield JlProjection.sign(i, j)
    signs.foreach(s => math.abs(s) shouldBe 1.0)
    // md5 parity should be unbiased: a heavily skewed matrix would mean
    // the hash-derived signs are broken
    val pos = signs.count(_ > 0).toDouble / signs.length
    pos should (be >= 0.4 and be <= 0.6)
    // and stable across invocations (plan literals must not drift)
    (0 until D).foreach { i =>
      (0 until K).foreach(j => JlProjection.sign(i, j) shouldBe JlProjection.sign(i, j))
    }
  }
}
