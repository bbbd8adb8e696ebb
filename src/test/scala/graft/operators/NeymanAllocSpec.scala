package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NeymanAllocSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-strata allocation: n_h proportional to N_h * sigma_h") {
    // Stratum a: 4 docs, values 0/0/10/10 -> sigma = 5, N*sigma = 20.
    // Stratum b: 2 docs, values 4/6       -> sigma = 1, N*sigma = 2.
    val docs = Seq(("a", 0), ("a", 0), ("a", 10), ("a", 10),
      ("b", 4), ("b", 6)).toDF("src", "x")
    val out = NeymanAlloc.allocate(docs, "src", "x", k = 11)
      .collect().map(r => r.getString(0) -> r).toMap
    out("a").getDouble(3) shouldBe 5.0
    out("b").getDouble(3) shouldBe 1.0
    out("a").getDouble(4) shouldBe (20.0 / 22.0)
    out("b").getDouble(4) shouldBe (2.0 / 22.0)
    out("a").getDouble(5) shouldBe 4.0 // 11 * 20/22 = 10 capped at N_a = 4
    out("b").getDouble(5) shouldBe (11 * 2.0 / 22.0)
  }

  test("allocation is capped at the stratum size") {
    // Stratum tiny: 2 docs with huge spread; stratum big: constant docs.
    // Uncapped Neyman would send nearly the whole budget to tiny.
    val docs = (Seq(("tiny", 0), ("tiny", 1000)) ++
      (1 to 50).map(_ => ("big", 7))).toDF("src", "x")
    val out = NeymanAlloc.allocate(docs, "src", "x", k = 20)
      .collect().map(r => r.getString(0) -> r).toMap
    out("tiny").getDouble(5) shouldBe 2.0 // min(20 * 1.0, N=2)
    out("big").getDouble(3) shouldBe 0.0 // constant stratum
    out("big").getDouble(5) shouldBe 0.0 // zero variance -> zero audit docs
  }

  test("all-constant corpus yields null share and alloc (Neyman undefined)") {
    val docs = (1 to 9).map(i => (s"s${i % 3}", 42)).toDF("src", "x")
    val out = NeymanAlloc.allocate(docs, "src", "x", k = 5).collect()
    out.length shouldBe 3
    out.foreach { r =>
      r.isNullAt(4) shouldBe true
      r.isNullAt(5) shouldBe true
    }
  }
}
