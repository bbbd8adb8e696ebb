package graft.functions

import graft.schema.Event
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` example (SURVEY §2.10): per-group
  * funnel rollup over typed `Event`s, usable as a `TypedColumn` on
  * `Dataset[Event]` or registered for SQL.
  *
  * When to reach for this instead of `groupBy().agg(...)`: the buffer is a
  * single flat case class updated imperatively — for genuinely custom
  * accumulation (sketches, state machines) this is the supported typed
  * API, and it plans as an ObjectHashAggregate with partial merge, so it
  * scales like any other aggregation (map-side reduce, then one shuffle of
  * buffers).
  */
object FunnelAggregator extends Aggregator[Event, FunnelBuf, FunnelOut] {

  override def zero: FunnelBuf = FunnelBuf(0L, 0L, 0L, 0.0)

  override def reduce(b: FunnelBuf, e: Event): FunnelBuf = FunnelBuf(
    b.views + (if (e.event_type == "view") 1 else 0),
    b.carts + (if (e.event_type == "click" || e.event_type == "cart") 1 else 0),
    b.purchases + (if (e.event_type == "purchase") 1 else 0),
    b.revenue + (if (e.event_type == "purchase") e.value else 0.0))

  override def merge(a: FunnelBuf, b: FunnelBuf): FunnelBuf = FunnelBuf(
    a.views + b.views, a.carts + b.carts,
    a.purchases + b.purchases, a.revenue + b.revenue)

  override def finish(b: FunnelBuf): FunnelOut = FunnelOut(
    b.views, b.carts, b.purchases, b.revenue,
    if (b.views == 0) None else Some(b.purchases.toDouble / b.views))

  override def bufferEncoder: Encoder[FunnelBuf] = Encoders.product[FunnelBuf]
  override def outputEncoder: Encoder[FunnelOut] = Encoders.product[FunnelOut]
}

final case class FunnelBuf(views: Long, carts: Long, purchases: Long, revenue: Double)

final case class FunnelOut(views: Long, carts: Long, purchases: Long,
                           revenue: Double, conversion: Option[Double])
