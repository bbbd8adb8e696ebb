package graft.functions

import graft.SparkSpec
import graft.schema.Event
import java.sql.Timestamp

class FunnelAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, uid: Long, et: String, v: Double) =
    Event(id, Timestamp.valueOf("2019-10-01 10:00:00"), uid, et, v, "{}")

  test("typed Aggregator computes per-user funnel with conversion") {
    val ds = Seq(
      ev(1, 1, "view", 0), ev(2, 1, "view", 0), ev(3, 1, "purchase", 25.5),
      ev(4, 2, "click", 0)).toDS()
    val out = ds.groupByKey(_.user_id)
      .agg(FunnelAggregator.toColumn.name("funnel"))
      .collect().toMap
    out(1L).views shouldBe 2
    out(1L).purchases shouldBe 1
    out(1L).revenue shouldBe 25.5
    out(1L).conversion shouldBe Some(0.5)
    out(2L).carts shouldBe 1
    out(2L).conversion shouldBe None // 0 views → no rate, not inf (§7.4.1)
  }

  test("merge is associative: result independent of partitioning") {
    val events = (1 to 100).map(i =>
      ev(i, i % 3, if (i % 5 == 0) "purchase" else "view", i.toDouble))
    val one = events.toDS().repartition(1).groupByKey(_.user_id)
      .agg(FunnelAggregator.toColumn).collect().toMap
    val many = events.toDS().repartition(7).groupByKey(_.user_id)
      .agg(FunnelAggregator.toColumn).collect().toMap
    one shouldBe many
  }
}
