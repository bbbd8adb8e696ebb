package graft.queries

import graft.SparkSpec

class TokenBurstinessSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("burstiness = cf/df with exact counts, df_frac in (0,1]") {
    val rows = CorpusQueries.tokenBurstiness(spark, dir).collect()
    rows.length should be <= 100
    rows should not be empty
    rows.foreach { r =>
      val cf = r.getLong(1); val df = r.getLong(2)
      cf should be >= df // a token occurs at least once per containing doc
      r.getDouble(3) shouldBe cf.toDouble / df.toDouble
      r.getDouble(4) should (be > 0.0 and be <= 1.0)
    }
  }

  test("a template token concentrated in one doc out-bursts a spread common word") {
    import spark.implicits._
    val docs = (1L to 9L).map(i => (i, "the cat sat")) :+
      ((10L, ("boiler " * 30).trim)) // 30 occurrences, one doc
    val out = CorpusQueries.tokenBurstiness(spark, {
      val d = docs.toDF("doc_id", "text")
      val tmp = s"/tmp/graft-burst-${ProcessHandle.current().pid()}"
      d.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("s"))
        .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      tmp
    }).collect().map(r => r.getString(0) -> r).toMap
    out("boiler").getDouble(3) shouldBe 30.0 // all mass in one doc
    out("the").getDouble(3) shouldBe 1.0 // evenly spread
    out("boiler").getDouble(4) shouldBe 0.1 // df_frac: 1 of 10 docs
  }
}
