package graft.operators

import graft.SparkSpec

class UniMaxSpec extends SparkSpec {
  import spark.implicits._

  private def sizes(rows: (String, Long)*) =
    rows.toDF("source", "n_tokens")

  test("skewed sources: small ones saturate, the large one rides the waterline; budget conserved") {
    // capacities ×2.0: 20 / 180 / 800; budget = floor(0.8 × 500) = 400
    val out = UniMax.allocateFrac(
      sizes("a" -> 10L, "b" -> 90L, "c" -> 400L), budgetFrac = 0.8, epochCap = 2.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    out("a").getAs[Long]("saturated") shouldBe 1L
    out("a").getAs[Double]("alloc") shouldBe 20.0
    out("a").getAs[Double]("epochs") shouldBe 2.0
    out("b").getAs[Long]("saturated") shouldBe 1L
    out("b").getAs[Double]("alloc") shouldBe 180.0
    // waterline τ = (400 − 20 − 180) / 1 = 200
    out("c").getAs[Long]("saturated") shouldBe 0L
    out("c").getAs[Double]("alloc") shouldBe 200.0
    out("c").getAs[Double]("epochs") shouldBe 0.5
    // with a non-saturated source present, the budget is spent exactly
    out.values.map(_.getAs[Double]("alloc")).sum shouldBe 400.0
  }

  test("uniform sources split the budget evenly (nobody saturates)") {
    val out = UniMax.allocateFrac(
      sizes("a" -> 100L, "b" -> 100L, "c" -> 100L), budgetFrac = 0.9, epochCap = 2.0)
      .collect()
    // budget = 270, capacity 200 each, fair level 90 < 200
    out.foreach { r =>
      r.getAs[Long]("saturated") shouldBe 0L
      r.getAs[Double]("alloc") shouldBe 90.0
    }
  }

  test("budget above total capacity: every source saturates, budget under-filled") {
    val out = UniMax.allocateFrac(
      sizes("a" -> 10L, "b" -> 90L), budgetFrac = 1.9, epochCap = 1.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    out("a").getAs[Double]("alloc") shouldBe 10.0
    out("b").getAs[Double]("alloc") shouldBe 90.0
    out.values.foreach(_.getAs[Long]("saturated") shouldBe 1L)
  }

  test("no source ever exceeds its epoch cap") {
    val out = UniMax.allocateFrac(
      sizes("a" -> 7L, "b" -> 31L, "c" -> 997L, "d" -> 3L),
      budgetFrac = 0.6, epochCap = 1.5).collect()
    out.foreach { r =>
      r.getAs[Double]("epochs") should be <= 1.5 + 1e-12
      r.getAs[Double]("alloc") should be <= r.getAs[Double]("capacity") + 1e-9
    }
  }

  test("empty input degrades to an empty allocation") {
    UniMax.allocateFrac(sizes(), budgetFrac = 0.5, epochCap = 2.0)
      .count() shouldBe 0L
  }
}
