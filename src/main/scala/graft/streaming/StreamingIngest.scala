package graft.streaming

import graft.io.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming equivalent of the reference's daily scheduled
  * ingest (SURVEY §2.9): a file source over the Day_Wise tree, a 1-day
  * event-time tumbling window with a 1-day watermark (modeling "a day
  * closes when its file is processed"), and `Trigger.AvailableNow` for
  * catch-up-then-stop batch-parity runs.
  *
  * At scale this is the migration path from scheduled batch: the same
  * DataFrame transformations, plus exactly-once file tracking and
  * incremental state — no operator rewrites.
  */
object StreamingIngest {

  /** Daily event counts as a streaming aggregation (the legacy A6 summary
    * query, incrementalized). */
  def dailyCounts(spark: SparkSession, rawRoot: String): DataFrame =
    Sources.rawEventsStream(spark, rawRoot)
      .withWatermark("event_time", "1 day")
      .groupBy(window(col("event_time"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("window.start")).as("event_date"), col("event_type"), col("n"))

  /** Streaming exact dedup — the ingest-time twin of
    * [[graft.dedup.ExactDedup]]: rows whose key columns repeat within the
    * watermark horizon are dropped as they arrive, with state bounded by
    * the watermark (dropDuplicatesWithinWatermark evicts expired keys —
    * a plain dropDuplicates would grow state forever on an unbounded
    * stream). At 100 TB/day this is the front-door dedup that keeps exact
    * copies from ever landing in the lake; the batch operators own
    * historical/near-dup passes. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  eventTimeCol: String = "event_time",
                  horizon: String = "1 day"): DataFrame =
    events.withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Run to completion over all currently-available files and stop
    * (AvailableNow), writing complete results per micro-batch via
    * foreachBatch into a parquet target — the streaming version of the
    * mart writer. Returns the finished query.
    *
    * NOTE on state: complete output mode keeps every (window, type) group
    * in state and rewrites the full result each batch — the watermark
    * evicts nothing. That is the right trade for bounded AvailableNow
    * catch-up runs (exact batch parity, tested); a CONTINUOUS deployment
    * must switch to append/update mode, where the 1-day watermark bounds
    * state to open windows (and the last day only emits once it closes). */
  def runAvailableNow(agg: DataFrame, outPath: String,
                      checkpoint: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
