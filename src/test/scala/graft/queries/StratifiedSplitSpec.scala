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
}
