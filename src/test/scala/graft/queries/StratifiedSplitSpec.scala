package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StratifiedSplitSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("per-source counts are exactly floor(n·0.8) / floor(n·0.1) / remainder") {
    val out = CorpusQueries.stratifiedSplit(spark, dir).cache()
    val per = out.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("va"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("te"))
      .collect()
    per should not be empty
    per.foreach { r =>
      val n = r.getLong(1)
      val expTr = math.floor(n * 0.8).toLong
      val expVa = math.floor(n * 0.1).toLong
      r.getLong(2) shouldBe expTr
      r.getLong(3) shouldBe expVa
      r.getLong(4) shouldBe n - expTr - expVa
    }
    // the split partitions the corpus: one row per doc, no split leakage
    out.count() shouldBe spark.read.parquet(s"$dir/documents.parquet").count()
    out.select("doc_id").distinct().count() shouldBe out.count()
    out.unpersist()
  }

  test("assignment is a pure function of doc_id within a source") {
    // same corpus read twice → identical assignment rows
    val a = CorpusQueries.stratifiedSplit(spark, dir).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = CorpusQueries.stratifiedSplit(spark, dir).collect().map(_.toSeq).sortBy(_.mkString("|"))
    a shouldBe b
  }

  test("ranged form (m134) is bit-identical to the window form (m87)") {
    val a = CorpusQueries.stratifiedSplit(spark, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = CorpusQueries.stratifiedSplitRanged(spark, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    b shouldBe a
  }

  test("ranged form matches the window rank on a 100:1-skewed fixture") {
    import spark.implicits._
    // one head source with 400 docs, four tail sources with 4 each — the
    // Zipf shape the escalation exists for
    val docs = ((0L until 400L).map(i => (i, "head")) ++
      (400L until 416L).map(i => (i, s"tail${i % 4}"))).toDF("doc_id", "source")
    val ranked = graft.operators.GroupedRanks.withRankAndCount(
      docs, "source",
      Seq(md5(col("doc_id").cast("string").cast("binary")), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    val windowed = docs
      .withColumn("rk", (row_number().over(w) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    key(ranked.select("doc_id", "source", "rk", "n").collect()) shouldBe
      key(windowed.select("doc_id", "source", "rk", "n").collect())
    // and the head group genuinely spans range partitions: its rank
    // continuity across partition boundaries is what the offsets prove
    ranked.filter(col("source") === "head").count() shouldBe 400L
  }

  test("ranged form plans NO window exchange (the escalation's point)") {
    val plan = CorpusQueries.stratifiedSplitRanged(spark, dir)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }
}
