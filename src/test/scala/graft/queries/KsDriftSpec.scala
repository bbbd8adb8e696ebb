package graft.queries

import graft.SparkSpec

class KsDriftSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("KS statistics are valid and the uniform-source corpus doesn't drift") {
    val rows = CorpusQueries.ksDrift(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getDouble(2) should (be >= 0.0 and be <= 1.0)
    }
    // the fixture's sources share one generator, so no source's score
    // distribution should exceed the Smirnov reference line
    rows.count(_.getBoolean(3)) shouldBe 0
  }

  test("a planted degenerate source exceeds the reference line") {
    import spark.implicits._
    val tmp = s"/tmp/graft-ks-${ProcessHandle.current().pid()}"
    // 60 normal-looking docs vs 20 empty-ish docs in one source: the
    // quality distributions separate almost completely
    val docs = ((1L to 60L).map(i => (i, "the cat sat on the mat and looked around for a while", "clean")) ++
      (61L to 80L).map(i => (i, "9999999999", "junk")))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusQueries.ksDrift(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    out("junk").getBoolean(3) shouldBe true
    out("junk").getDouble(2) should be > out("clean").getDouble(2)
  }
}
