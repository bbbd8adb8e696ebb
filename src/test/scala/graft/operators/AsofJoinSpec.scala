package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    // key, time, payload
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("q_key", "q_time", "price")

  private val trades = Seq(
    (1L, 1L, ts("2024-01-01 09:59:00")), // before any quote -> null
    (2L, 1L, ts("2024-01-01 10:05:00")), // exactly at a quote -> inclusive match
    (3L, 1L, ts("2024-01-01 10:07:30")), // between quotes -> 10:05 quote
    (4L, 1L, ts("2024-01-01 11:00:00")), // after all -> latest quote
    (5L, 2L, ts("2024-01-01 10:00:01")), // other key
    (6L, 3L, ts("2024-01-01 10:00:00")) // key with no quotes -> null
  ).toDF("trade_id", "t_key", "t_time")

  test("backward as-of picks greatest right time <= left time, inclusive") {
    val out = AsofJoin.backward(trades, quotes, "t_key", "q_key", "t_time", "q_time")
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    out(1L) shouldBe None
    out(2L) shouldBe Some(101.0)
    out(3L) shouldBe Some(101.0)
    out(4L) shouldBe Some(102.0)
    out(5L) shouldBe Some(200.0)
    out(6L) shouldBe None
  }

  test("every left row survives (left-outer) and right columns come through") {
    val out = AsofJoin.backward(trades, quotes, "t_key", "q_key", "t_time", "q_time")
    out.count() shouldBe 6
    out.columns.toSeq shouldBe Seq("trade_id", "t_key", "t_time", "q_key", "q_time", "price")
  }

  test("null right keys are dropped, not matched against null left keys") {
    val l = Seq((1L, Option.empty[Long], ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq((Option.empty[Long], ts("2024-01-01 09:00:00"), 1.0)).toDF("rk", "rt", "v")
    val out = AsofJoin.backward(l, r, "k", "rk", "t", "rt")
    out.select("v").as[Option[Double]].collect() shouldBe Array(None)
  }

  test("overlapping column names are rejected") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.backward(l, l, "k", "k", "t", "t")
  }
}
