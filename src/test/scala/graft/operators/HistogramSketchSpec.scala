package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private def vals(vs: (String, Long)*) = vs.toDF("g", "v")

  test("hand-pinned: 1..100 uniform, p50 lands exactly (bucket width < 1 value)") {
    // R = 100 < W = 1024, so every bucket holds at most one value and
    // the estimate IS the exact nearest-rank value at every q
    val rows = vals((1L to 100L).map(v => ("g", v)): _*)
    val range = HistogramSketch.valueRange(rows, col("v"))
    val sk = HistogramSketch.merge(
      HistogramSketch.counters(rows, Seq("g"), col("v"), range))
    val est = HistogramSketch.quantiles(sk, range, Seq(0.5, 0.9, 0.99))
      .orderBy("q").as[(Double, Long, Long)].collect()
    est.map(_._3).toSeq shouldBe Seq(50L, 90L, 99L)
    est.foreach(_._2 shouldBe 100L)
  }

  test("deterministic bound: 0 <= est - exact <= ceil(R/W) on a wide skewed range") {
    // values span ~200k (R >> W), heavy mass at the low end — the
    // shape that breaks naive equi-depth assumptions
    val rows = vals(((1 to 900).map(i => ("g", (i % 50 + 1).toLong)) ++
      (1 to 100).map(i => ("g", (i * 2000).toLong))): _*)
    val range = HistogramSketch.valueRange(rows, col("v"))
    val bound = range.select(expr(s"(r + ${HistogramSketch.Width - 1}) div ${HistogramSketch.Width}"))
      .as[Long].head()
    val sk = HistogramSketch.merge(
      HistogramSketch.counters(rows, Seq("g"), col("v"), range))
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val est = HistogramSketch.quantiles(sk, range, qs)
      .select("q", "est").as[(Double, Long)].collect().toMap
    val exact = HistogramSketch.exactQuantiles(
      rows.groupBy("v").agg(count(lit(1)).as("cnt")), qs)
      .select("q", "exact").as[(Double, Long)].collect().toMap
    qs.foreach { q =>
      withClue(s"q=$q: ") {
        (est(q) - exact(q)) should be >= 0L
        (est(q) - exact(q)) should be <= bound
      }
    }
  }

  test("negative values: the integer bucketing shifts by lo, no float anywhere") {
    val rows = vals(("g", -500L), ("g", -100L), ("g", 0L), ("g", 250L), ("g", 300L))
    val range = HistogramSketch.valueRange(rows, col("v"))
    range.as[(Long, Long, Long)].head() shouldBe ((-500L, 300L, 801L))
    val sk = HistogramSketch.merge(
      HistogramSketch.counters(rows, Seq("g"), col("v"), range))
    val est = HistogramSketch.quantiles(sk, range, Seq(0.2, 1.0))
      .orderBy("q").select("est").as[Long].collect()
    est(0) should be >= -500L
    est(0) should be <= -500L + 1L // p20 = rank 1 = -500, bound ceil(801/1024) = 1
    est(1) should be >= 300L       // p100 = max, overshoot <= bound
    est(1) should be <= 301L
  }

  test("exactQuantiles picks correctly when the picked VALUE is negative (found flag, not a sentinel)") {
    // review r17b: a `hit >= 0` latch overwrote a negative pick with
    // every later value, returning the max instead of the quantile
    val vc = Seq((-5L, 1L), (-3L, 1L), (10L, 1L)).toDF("v", "cnt")
    val out = HistogramSketch.exactQuantiles(vc, Seq(0.5, 1.0 / 3, 1.0))
      .select("q", "exact").as[(Double, Long)].collect().toMap
    out(1.0 / 3) shouldBe -5L
    out(0.5) shouldBe -3L
    out(1.0) shouldBe 10L
  }

  test("merge by elementwise add equals from-scratch; associative across three sources") {
    val rows = vals((1 to 600).map(i => (s"s${i % 3}", (i * 7 % 211).toLong)): _*)
    val range = HistogramSketch.valueRange(rows, col("v"))
    val per = HistogramSketch.counters(rows, Seq("g"), col("v"), range)
    def part(g: String) = per.filter(col("g") === g).drop("g")
    val ab = HistogramSketch.merge(part("s0").union(part("s1")))
    val abc = HistogramSketch.merge(ab.union(part("s2")))
      .as[(Long, Long)].collect().toSet
    val global = HistogramSketch.counters(rows, Seq.empty, col("v"), range)
      .as[(Long, Long)].collect().toSet
    abc shouldBe global
  }

  test("sketch and estimates are invariant to input partitioning") {
    val rows = vals((1 to 500).map(i => ("g", (i * 13 % 997).toLong)): _*)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val range = HistogramSketch.valueRange(df, col("v"))
      HistogramSketch.quantiles(
        HistogramSketch.merge(
          HistogramSketch.counters(df, Seq("g"), col("v"), range)),
        range, Seq(0.5, 0.9)).as[(Double, Long, Long)].collect().toSet
    }
    run(rows.repartition(13)) shouldBe run(rows)
  }

  test("grouped merge associativity: per-(g, shard) sketches folded to per-g equal from-scratch per-g counters (m151)") {
    val rows = Seq.tabulate(600)(i => (s"s${i % 3}", i.toLong % 2, (i * 7 % 211).toLong))
      .toDF("g", "shard_", "v")
    val range = HistogramSketch.valueRange(rows, col("v"))
    val merged = HistogramSketch.merge(
      HistogramSketch.counters(rows, Seq("g", "shard_"), col("v"), range),
      keepCols = Seq("g")).as[(String, Long, Long)].collect().toSet
    val direct = HistogramSketch.counters(rows, Seq("g"), col("v"), range)
      .as[(String, Long, Long)].collect().toSet
    merged shouldBe direct
  }

  test("quantilesBy: per-group estimates honor the per-group exact values within the global bound (m151)") {
    val rows = Seq.tabulate(900)(i => (s"s${i % 3}", (i * 13 % 997 + (i % 3) * 500).toLong))
      .toDF("g", "v")
    val range = HistogramSketch.valueRange(rows, col("v"))
    val bound = range.select(expr(s"(r + ${HistogramSketch.Width - 1}) div ${HistogramSketch.Width}"))
      .as[Long].head()
    val qs = Seq(0.25, 0.5, 0.9)
    val est = HistogramSketch.quantilesBy(
      HistogramSketch.counters(rows, Seq("g"), col("v"), range), range, qs, Seq("g"))
      .select("g", "q", "est").as[(String, Double, Long)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    val exact = HistogramSketch.exactQuantilesBy(
      rows.groupBy("g", "v").agg(count(lit(1)).as("cnt")), qs, Seq("g"))
      .select("g", "q", "exact").as[(String, Double, Long)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    est.keySet shouldBe exact.keySet
    est.keySet.size shouldBe 9 // 3 groups x 3 qs
    est.foreach { case (k, e) =>
      withClue(s"$k: ") {
        (e - exact(k)) should be >= 0L
        (e - exact(k)) should be <= bound
      }
    }
  }

  test("null values are dropped by counters itself (the CountMin null rule), not by callers") {
    // advice r18: a nullable valueCol must not mint a null-bucket row
    // that inflates n — the operator owns the null rule
    val rows = Seq(("g", Some(1L)), ("g", None), ("g", Some(100L)), ("g", None))
      .toDF("g", "v")
    val range = HistogramSketch.valueRange(rows, col("v"))
    val sk = HistogramSketch.counters(rows, Seq("g"), col("v"), range)
    sk.filter(col("bucket").isNull).count() shouldBe 0
    sk.agg(sum("cnt")).as[Long].head() shouldBe 2L // only the 2 non-null values
    val est = HistogramSketch.quantiles(HistogramSketch.merge(sk), range, Seq(1.0))
      .as[(Double, Long, Long)].head()
    est._2 shouldBe 2L // n counts non-null rows only, matching SQL aggregates
  }

  test("empty input: empty range, empty sketch, empty estimates — never a NaN or a lone row") {
    val none = vals()
    val range = HistogramSketch.valueRange(none, col("v"))
    range.count() shouldBe 0
    val sk = HistogramSketch.counters(none, Seq("g"), col("v"), range)
    sk.count() shouldBe 0
    HistogramSketch.quantiles(HistogramSketch.merge(sk), range, Seq(0.5))
      .count() shouldBe 0
  }
}
