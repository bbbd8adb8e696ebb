package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def items(rows: (String, String)*) = rows.toDF("g", "item")

  test("a lone item's estimate is exact (no cell shared, min over rows = its count)") {
    val rows = items(Seq.fill(3)(("a", "x")): _*)
    val est = CountMin.estimate(
      CountMin.counters(rows, Seq("g"), col("item")),
      items(("a", "x")), "item", Seq("g")).collect()
    est.length shouldBe 1
    est(0).getAs[Long]("cms_estimate") shouldBe 3L
  }

  test("one-sided error: estimate >= exact count for EVERY probed item; unseen items estimate >= 0") {
    val corpus = (1 to 400).map(i => ("g", s"w${i % 37}")) ++
      (1 to 100).map(_ => ("g", "heavy"))
    val rows = items(corpus: _*)
    val cnts = CountMin.counters(rows, Seq("g"), col("item"))
    val exact = rows.groupBy("g", "item").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimate(cnts, exact, "item", Seq("g"))
      .join(exact, Seq("g", "item"))
      .select("item", "cms_estimate", "exact")
      .collect()
    est.length shouldBe 38
    est.foreach { r =>
      withClue(s"${r.getString(0)}: ") {
        r.getLong(1) should be >= r.getLong(2)
      }
    }
    // the heavy item dominates its cells: its estimate is its count
    // plus only whatever light mass collides — bounded way below 2x
    val heavy = est.find(_.getString(0) == "heavy").get
    heavy.getLong(2) shouldBe 100L
    heavy.getLong(1) should be < 200L
    // a never-seen item reads the min over its cells — possibly > 0
    // from collisions, never negative
    CountMin.estimate(cnts, items(("g", "never-seen-item")), "item", Seq("g"))
      .head().getAs[Long]("cms_estimate") should be >= 0L
  }

  test("merge by elementwise add equals the from-scratch counters; associative and commutative") {
    val all = (1 to 300).map(i => (s"s${i % 3}", s"item${i % 23}"))
    val rows = items(all: _*)
    val perSource = CountMin.counters(rows, Seq("g"), col("item"))
    def part(g: String) = perSource.filter(col("g") === g).drop("g")
    val ab = CountMin.merge(part("s0").union(part("s1")))
    val bc = CountMin.merge(part("s1").union(part("s2")))
    val abc1 = CountMin.merge(ab.union(part("s2")))
      .as[(Int, Long, Long)].collect().toSet
    val abc2 = CountMin.merge(part("s0").union(bc))
      .as[(Int, Long, Long)].collect().toSet
    val global = CountMin.counters(rows.drop("g"), Seq.empty, col("item"))
      .as[(Int, Long, Long)].collect().toSet
    abc1 shouldBe global
    abc2 shouldBe global
  }

  test("counters are invariant to input partitioning (integer sums)") {
    val rows = items((1 to 500).map(i => ("g", s"t${i % 41}")): _*)
    val a = CountMin.counters(rows, Seq("g"), col("item"))
      .as[(String, Int, Long, Long)].collect().toSet
    val b = CountMin.counters(rows.repartition(13), Seq("g"), col("item"))
      .as[(String, Int, Long, Long)].collect().toSet
    b shouldBe a
  }

  test("null items are dropped inside the operator, never hashed as the bare salt") {
    // review r17b: concat_ws would hash a null item as "j" alone while
    // the oracle's j || ':' || item NULLs out — the operator owns the rule
    val rows = Seq(("a", Option("x")), ("a", None), ("a", Option("x")))
      .toDF("g", "item")
    val cnts = CountMin.counters(rows, Seq("g"), col("item"))
    CountMin.estimate(cnts, items(("a", "x")), "item", Seq("g"))
      .head().getAs[Long]("cms_estimate") shouldBe 2L
    // every cell holds exactly the two non-null occurrences
    cnts.agg(max("cnt")).head().getLong(0) shouldBe 2L
  }

  test("weighted counting: weight w adds w per occurrence") {
    val rows = items(("a", "x"), ("a", "x"))
    val est = CountMin.estimate(
      CountMin.counters(rows, Seq("g"), col("item"), weight = lit(5L)),
      items(("a", "x")), "item", Seq("g")).head()
    est.getAs[Long]("cms_estimate") shouldBe 10L
  }

  test("bucket arithmetic matches the portable md5 convention per row") {
    // row j of item 'ab' must equal hash48("j:ab") % 1024 — the same
    // hex12 identity LangIdSpec pins, salted per row
    val one = items(("g", "ab"))
    val cells = CountMin.counters(one, Seq.empty, col("item"))
      .orderBy("r").as[(Int, Long, Long)].collect()
    cells.length shouldBe CountMin.Depth
    val expected = (0 until CountMin.Depth).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$j:ab".getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
        ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
        ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
      v % CountMin.Width
    }
    cells.map(_._2).toSeq shouldBe expected
  }
}
