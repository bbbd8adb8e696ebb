package graft.io

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private def write(name: String, body: String): String = {
    val dir = Files.createTempDirectory("sources-dev").toString
    Files.write(Paths.get(s"$dir/$name"), body.getBytes)
    s"$dir/$name"
  }

  test("devInferCsv infers usable types from a clean feed") {
    val path = write("feed.csv",
      """id,amount,seen_at
        |1,9.50,2019-10-01 10:00:00+00:00
        |2,3.25,2019-10-01 11:00:00+00:00
        |""".stripMargin)
    val df = Sources.devInferCsv(spark, path)
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    byName("id") shouldBe IntegerType // inferred, not string
    byName("amount") shouldBe DoubleType
    byName("seen_at") shouldBe TimestampType
    df.filter(col("id") === 2).select("amount")
      .collect().head.getDouble(0) shouldBe 3.25
  }

  test("devInferCsv quarantines malformed rows — and they widen inference (the documented hazard)") {
    val path = write("dirty.csv",
      """id,amount,seen_at
        |1,9.50,2019-10-01 10:00:00+00:00
        |oops,not-a-number
        |2,3.25,2019-10-01 11:00:00+00:00
        |""".stripMargin)
    // cache first: Spark disallows filtering RAW csv on only the corrupt
    // column (the row would have to re-parse to decide its own validity)
    val df = Sources.devInferCsv(spark, path).cache()
    try {
      // PERMISSIVE: the bad row survives, flagged — a dev exploring a new
      // feed sees what failed instead of losing the whole file
      df.filter(col("_corrupt_record").isNotNull).count() shouldBe 1
      df.filter(col("_corrupt_record").isNull).count() shouldBe 2
      // ...but ONE bad row degraded every column to string for the whole
      // load — precisely why production paths freeze an explicit schema
      // (Sources scaladoc) instead of inferring per run.
      df.schema("id").dataType shouldBe StringType
    } finally df.unpersist()
  }
}
