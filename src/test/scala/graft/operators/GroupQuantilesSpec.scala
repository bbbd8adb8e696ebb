package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def card(rows: (String, Long, Long)*)(qs: Double*) =
    GroupQuantiles.nearestRank(rows.toDF("g", "id", "v"),
        groupCol = "g", valueCol = "v", tieCol = "id", qs = qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("hand-computed nearest-rank quantiles on 1..5") {
    val rows = (1L to 5L).map(i => ("a", i, i * 10L))
    val out = card(rows: _*)(0.0, 0.25, 0.5, 0.75, 1.0)
    // n=5: target ranks floor(q·4)+1 = 1, 2, 3, 4, 5
    out(("a", 0.0)) shouldBe ((5L, 10L))
    out(("a", 0.25)) shouldBe ((5L, 20L))
    out(("a", 0.5)) shouldBe ((5L, 30L))
    out(("a", 0.75)) shouldBe ((5L, 40L))
    out(("a", 1.0)) shouldBe ((5L, 50L))
  }

  test("lower-median convention on an even group; q=0/1 are min/max") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L))
    val out = card(rows: _*)(0.0, 0.5, 1.0)
    out(("a", 0.5)) shouldBe ((4L, 20L)) // floor(0.5·3)+1 = rank 2 — the LOWER median
    out(("a", 0.0))._2 shouldBe 10L
    out(("a", 1.0))._2 shouldBe 40L
  }

  test("groups are independent; a single-row group reports its value at every q") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 99L), ("b", 3L, 7L))
    val out = card(rows: _*)(0.0, 0.5, 1.0)
    out(("b", 0.0)) shouldBe ((1L, 7L))
    out(("b", 0.5)) shouldBe ((1L, 7L))
    out(("b", 1.0)) shouldBe ((1L, 7L))
    out(("a", 1.0))._2 shouldBe 99L
  }

  test("value ties: the tie column totalizes the order, the reported VALUE is unambiguous") {
    // three equal values — whatever rank is selected, the value is the tie
    val rows = Seq(("a", 3L, 5L), ("a", 1L, 5L), ("a", 2L, 5L))
    val out = card(rows: _*)(0.5)
    out(("a", 0.5)) shouldBe ((3L, 5L))
  }

  test("input columns named n/rn/q do not collide with the internals; output-name collisions are rejected") {
    // valueCol literally named "n": the group count must not replace it
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L)).toDF("g", "id", "n")
    val out = GroupQuantiles.nearestRank(rows, "g", "n", "id", Seq(1.0)).collect()
    out.head.getLong(3) shouldBe 20L // the VALUE, not the group size 2
    an[IllegalArgumentException] should be thrownBy
      GroupQuantiles.nearestRank(rows.withColumnRenamed("g", "value"),
        "value", "n", "id", Seq(0.5))
  }

  test("plan: no percentile aggregate, ranks from the ranged pass, generate pipelined") {
    val df = GroupQuantiles.nearestRank(
      Seq(("a", 1L, 1L)).toDF("g", "id", "v"), "g", "v", "id", Seq(0.5))
    val p = df.queryExecution.executedPlan.toString
    (p should not).include("percentile")
    // round 16: ranks come from the range-partitioned GroupedRanks pass
    // (pinned snapshot), not a per-group window sort task
    (p should not).include("Window")
    p should include("ExistingRDD")
    p should include("Generate")
  }

  test("ranged form equals the window reference on a skewed fixture (byte-identical)") {
    // Round 16 escalation pin (the m87/m134 convention): ranks are a
    // pure function of the (value, tie) total order, so the selected
    // quantile rows must match the row_number/count window form exactly
    // — verified on a skewed group mix with value ties.
    val rows = (0 until 700).map(i => ("head", i.toLong, (i % 37).toLong)) ++
      (700 until 760).map(i => ("mid", i.toLong, (i % 11).toLong)) ++
      (760 until 765).map(i => ("tail", i.toLong, 3L))
    val df = rows.toDF("g", "id", "v").repartition(13)
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = GroupQuantiles.nearestRank(df, "g", "v", "id", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val wAll = Window.partitionBy("g")
    val want = df.select(col("g"), col("v"), col("id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("g"), col("v"), col("rn"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .filter(col("rn") ===
        floor(col("q") * (col("n") - 1L).cast("double")).cast("long") + 1L)
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getLong(3), r.getLong(1))).toSet
    got shouldBe want
  }
}
