package graft.streaming

import graft.SparkSpec
import graft.io.Sources
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the AvailableNow streaming aggregation over the
  * Day_Wise tree must produce exactly the batch answer (SURVEY §2.9). */
class StreamingIngestSpec extends SparkSpec {

  private val root = Files.createTempDirectory("graft-stream-raw").toString
  private val out = Files.createTempDirectory("graft-stream-out").toString

  private def writeDay(date: String, rows: Seq[(String, String)]): Unit = {
    val dir = Paths.get(s"$root/Day_Wise/$date")
    Files.createDirectories(dir)
    val header = "event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session,event_date"
    val lines = rows.map { case (t, et) =>
      s"$t,$et,1,1,c,b,1.00,1,s,$date"
    }
    Files.write(dir.resolve("event.csv"), (header +: lines).mkString("\n").getBytes)
  }

  writeDay("2019-10-01", Seq(
    ("2019-10-01 10:00:00+00:00", "view"), ("2019-10-01 11:00:00+00:00", "view"),
    ("2019-10-01 12:00:00+00:00", "purchase")))
  writeDay("2019-10-02", Seq(
    ("2019-10-02 01:00:00+00:00", "cart"), ("2019-10-02 23:59:59+00:00", "view")))

  test("AvailableNow streaming daily counts equal the batch aggregation") {
    val agg = StreamingIngest.dailyCounts(spark, root)
    StreamingIngest.runAvailableNow(agg, s"$out/daily",
      s"$out/ckpt-${System.nanoTime()}")

    val streamed = spark.read.parquet(s"$out/daily")
      .orderBy("event_date", "event_type")
      .select("event_date", "event_type", "n")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSeq

    val batch = Sources.rawEventsCsvAll(spark, root)
      .groupBy(to_date(col("event_time")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_date", "event_type")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSeq

    streamed shouldBe batch
    streamed.map(_._3).sum shouldBe 5
  }

  test("streaming source respects the declared schema (no inference)") {
    val stream = Sources.rawEventsStream(spark, root)
    stream.schema.fieldNames should contain allOf ("event_time", "event_type", "price")
    stream.isStreaming shouldBe true
  }

  test("streaming dedup drops repeated keys across micro-batches (bounded state)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingIngest.dedupStream(
      input.toDF().toDF("event_time", "fingerprint"), Seq("fingerprint"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2019-10-01 10:00:00")
    input.addData((t, "fp1"), (t, "fp1"), (t, "fp2")) // intra-batch dup
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2019-10-01 10:05:00"), "fp1")) // cross-batch dup
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2019-10-01 10:10:00"), "fp3"))
    q.processAllAvailable()
    val seen = spark.table("dedup_out").select("fingerprint").as[String].collect().sorted
    q.stop()
    seen shouldBe Array("fp1", "fp2", "fp3")
  }

  test("exported Day_Wise tree: one event.csv per day, streaming counts equal the source aggregation") {
    import org.apache.spark.sql.functions.{count => cnt}
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val exportRoot = Files.createTempDirectory("graft-stream-export").toString
    val days = StreamingIngest.exportDayWiseCsv(events, exportRoot)
    days shouldBe events
      .select(to_date(col("ts")).as("d")).distinct().count().toInt
    // the tree has the reference layout (the exact name the readers glob)
    Files.exists(Paths.get(
      s"$exportRoot/Day_Wise").toAbsolutePath) shouldBe true
    // batch read-back through the declared raw schema reconciles row count
    val batch = Sources.rawEventsCsvAll(spark, exportRoot)
    batch.count() shouldBe events.count()
    // and the streaming catch-up over the exported tree equals the
    // ORIGINAL events aggregation — the bench stream:ingest contract
    StreamingIngest.runAvailableNow(
      StreamingIngest.dailyCounts(spark, exportRoot),
      s"$exportRoot/out", s"$exportRoot/ckpt")
    val streamed = spark.read.parquet(s"$exportRoot/out")
      .orderBy("event_date", "event_type")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val direct = events
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(cnt(lit(1)).as("n"))
      .orderBy("event_date", "event_type")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    streamed shouldBe direct
  }
}
