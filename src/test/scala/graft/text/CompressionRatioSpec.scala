package graft.text

import graft.SparkSpec

class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far better than varied text") {
    val docs = Seq(
      (1L, "spam spam " * 200),
      (2L, (0 until 400).map(i => s"w${i * 7919 % 9973}").mkString(" "))
    ).toDF("doc_id", "text")
    val out = CompressionRatio.ratios(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out(1L) should be < 0.05
    out(2L) should be > 0.3
    out(1L) should be < out(2L) / 5
  }

  test("byte accounting: raw bytes are UTF-8 length; empty doc contracts to ratio 1") {
    val docs = Seq((1L, "héllo"), (2L, "")).toDF("doc_id", "text")
    val rows = CompressionRatio.ratios(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rows(1L)._1 shouldBe 6L  // é is 2 bytes
    rows(1L)._2 should be > 0L
    rows(2L)._1 shouldBe 0L
    rows(2L)._3 shouldBe 1.0 +- 1e-12
  }

  test("deterministic across runs and over the sf0.001 corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = CompressionRatio.ratios(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = CompressionRatio.ratios(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    a shouldBe b
    a.length should be > 0
  }
}
