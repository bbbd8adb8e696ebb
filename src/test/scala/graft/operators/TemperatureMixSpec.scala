package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  private def sizes(rows: (String, Long, Long)*) =
    rows.toDF("source", "n_docs", "n_tokens")

  private def bySource(df: org.apache.spark.sql.DataFrame): Map[String, Row] =
    df.collect().map(r => r.getAs[String]("source") -> r).toMap

  test("alpha = 1 reproduces raw proportions bit-for-bit") {
    val out = bySource(TemperatureMix.allocate(
      sizes(("a", 10L, 100L), ("b", 80L, 800L), ("c", 10L, 100L)),
      alpha = 1.0, budgetFrac = 1.0))
    out.values.foreach { r =>
      r.getAs[Double]("weight") shouldBe r.getAs[Double]("p_raw")
    }
  }

  test("alpha = 0 is the uniform mix") {
    val out = bySource(TemperatureMix.allocate(
      sizes(("a", 1L, 10L), ("b", 1L, 1000L)), alpha = 0.0))
    out("a").getAs[Double]("weight") shouldBe 0.5
    out("b").getAs[Double]("weight") shouldBe 0.5
  }

  test("alpha = 0.3 up-weights the small source above its raw share; weights sum to 1; alloc sums to budget") {
    val out = bySource(TemperatureMix.allocate(
      sizes(("small", 10L, 100L), ("big", 90L, 10000L)),
      alpha = 0.3, budgetFrac = 0.8))
    val s = out("small"); val b = out("big")
    s.getAs[Double]("weight") should be > s.getAs[Double]("p_raw")
    b.getAs[Double]("weight") should be < b.getAs[Double]("p_raw")
    (s.getAs[Double]("weight") + b.getAs[Double]("weight")) shouldBe 1.0 +- 1e-12
    s.getAs[Long]("budget") shouldBe math.floor(10100 * 0.8).toLong
    (s.getAs[Double]("alloc_tokens") + b.getAs[Double]("alloc_tokens")) shouldBe
      (8080.0 +- 1e-9)
    // epochs = what fraction of the source one pass of the mix consumes
    s.getAs[Double]("epochs") shouldBe
      (s.getAs[Double]("alloc_tokens") / 100.0)
  }

  test("a zero-token source gets zero weight and NULL epochs (the /0 contract)") {
    val out = bySource(TemperatureMix.allocate(
      sizes(("empty", 1L, 0L), ("full", 1L, 100L)), alpha = 0.3))
    out("empty").getAs[Double]("weight") shouldBe 0.0
    out("empty").isNullAt(out("empty").fieldIndex("epochs")) shouldBe true
    out("full").getAs[Double]("weight") shouldBe 1.0
  }

  test("empty sizes table degrades to an empty card") {
    TemperatureMix.allocate(sizes()).count() shouldBe 0L
  }

  test("an all-zero-token corpus yields NULL weight/p_raw/alloc/epochs, never NaN (the /0 contract)") {
    val out = bySource(TemperatureMix.allocate(
      sizes(("a", 1L, 0L), ("b", 2L, 0L)), alpha = 0.3))
    out.values.foreach { r =>
      Seq("p_raw", "weight", "alloc_tokens", "epochs").foreach { c =>
        withClue(c) { r.isNullAt(r.fieldIndex(c)) shouldBe true }
      }
      r.getAs[Long]("budget") shouldBe 0L
    }
  }
}
