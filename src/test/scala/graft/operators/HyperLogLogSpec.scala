package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  test("bucket and rho arithmetic: top 12 bits route, leading zeros of the rest rank") {
    // Synthetic 48-bit hashes with known layouts: h = bucket·2^36 + rest.
    val rows = Seq(
      ("g", 5L * (1L << 36) + (1L << 35)),  // rest MSB set → rho 1
      ("g", 5L * (1L << 36) + 1L),          // rest = 1 → 35 leading zeros → rho 36; register max keeps 36
      ("g", 7L * (1L << 36)),               // rest = 0 → rho 37 (the cap)
      ("g", 7L * (1L << 36) + (1L << 20))   // same bucket, rho 16 — max keeps 37
    ).toDF("g", "h")
    val regs = HyperLogLog.registers(rows, Seq("g"), col("h"))
      .orderBy("bucket").as[(String, Long, Int)].collect()
    regs shouldBe Array(("g", 5L, 36), ("g", 7L, 37))
  }

  test("registers are partition-invariant and merge by pointwise max") {
    val vals = (1 to 3000).map(i => ("s", s"value-$i")).toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    val whole = HyperLogLog.registers(vals, Seq("g"), col("h"))
      .as[(String, Long, Int)].collect().toSet
    val re = HyperLogLog.registers(vals.repartition(13), Seq("g"), col("h"))
      .as[(String, Long, Int)].collect().toSet
    re shouldBe whole
    // union-of-halves sketches merge to the whole by max(rho) — the
    // mergeability that makes the sketch a valid distributed aggregate
    val h1 = HyperLogLog.registers(vals.filter(col("h") % 2 === 0), Seq("g"), col("h"))
    val h2 = HyperLogLog.registers(vals.filter(col("h") % 2 =!= 0), Seq("g"), col("h"))
    val merged = h1.union(h2).groupBy("g", "bucket").agg(max("rho").as("rho"))
      .as[(String, Long, Int)].collect().toSet
    merged shouldBe whole
  }

  test("merge is associative/commutative and equals the from-scratch global sketch (m148)") {
    // three disjoint 'sources' — merge(merge(A,B),C), merge(A,merge(B,C))
    // and registers(A∪B∪C) must be the SAME register table, so the
    // merged estimate is bit-identical to a from-scratch build (the
    // dyadic-exact register sum makes even the estimate deterministic)
    val vals = (1 to 9000).map(i => (s"s${i % 3}", s"value-$i")).toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    val perSource = HyperLogLog.merge( // identity on a register table
      HyperLogLog.registers(vals, Seq("g"), col("h")), Seq("g"))
    def regsOf(src: String) = perSource.filter(col("g") === src).drop("g")
    val ab = HyperLogLog.merge(regsOf("s0").union(regsOf("s1")))
    val bc = HyperLogLog.merge(regsOf("s1").union(regsOf("s2")))
    val abc1 = HyperLogLog.merge(ab.union(regsOf("s2")))
      .as[(Long, Int)].collect().toSet
    val abc2 = HyperLogLog.merge(regsOf("s0").union(bc))
      .as[(Long, Int)].collect().toSet
    val global = HyperLogLog.registers(vals.drop("g").withColumn("g", lit("all")),
        Seq("g"), col("h")).drop("g")
      .as[(Long, Int)].collect().toSet
    abc1 shouldBe global
    abc2 shouldBe global
    // and the estimates agree exactly (same registers → same dyadic sum)
    val eMerged = HyperLogLog.estimate(HyperLogLog.merge(
        HyperLogLog.registers(vals, Seq("g"), col("h"))), Seq.empty)
      .select("hll_estimate").as[Double].head()
    val eGlobal = HyperLogLog.estimate(
        HyperLogLog.registers(vals.withColumn("g", lit("all")), Seq("g"), col("h")),
        Seq("g"))
      .select("hll_estimate").as[Double].head()
    java.lang.Double.doubleToLongBits(eMerged) shouldBe
      java.lang.Double.doubleToLongBits(eGlobal)
  }

  test("estimate lands within 5% of a 50k-distinct truth (HLL regime)") {
    val vals = (1 to 50000).map(i => ("s", s"item-$i")).toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    val est = HyperLogLog.estimate(
      HyperLogLog.registers(vals, Seq("g"), col("h")), Seq("g"))
      .select("hll_estimate").as[Double].head()
    est shouldBe 50000.0 +- 2500.0
  }

  test("small cardinalities take the linear-counting branch and are near-exact") {
    val vals = (1 to 10).map(i => ("s", s"rare-$i")).toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    val out = HyperLogLog.estimate(
      HyperLogLog.registers(vals, Seq("g"), col("h")), Seq("g"))
      .select("registers_hit", "hll_estimate").as[(Long, Double)].head()
    // 10 distinct values, no bucket collision expected at m=4096 — and
    // linear counting m·ln(m/(m−10)) ≈ 10.011: within 1% of truth
    out._1 shouldBe 10
    out._2 shouldBe 10.0 +- 0.1
  }

  test("duplicates do not move the sketch: 100 copies of 500 values ≡ 500 values") {
    val distinct = (1 to 500).map(i => ("s", s"d-$i"))
    val dups = Seq.fill(100)(distinct).flatten.toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    val once = distinct.toDF("g", "v")
      .select(col("g"), HyperLogLog.hash48(col("v")).as("h"))
    def est(df: org.apache.spark.sql.DataFrame) = HyperLogLog.estimate(
      HyperLogLog.registers(df, Seq("g"), col("h")), Seq("g"))
      .select("hll_estimate").as[Double].head()
    est(dups) shouldBe est(once)
  }
}
