package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory collect for hot-key capping: accumulates ids until the
  * group provably exceeds `cap`, then stops growing — the buffer never
  * holds more than cap+1 elements. Groups over the cap finish as null
  * (the caller's "drop this bucket" signal).
  *
  * Why this exists: the `collect_list(...)` + `size(...) <= cap` idiom the
  * dedup pipelines used materializes the ENTIRE posting/bucket list in the
  * aggregation buffer before the filter can discard it — a viral gram or
  * LSH bucket with df ~10^8 would build a multi-hundred-MB array in one
  * hash-agg buffer at 100 TB and OOM the executor. This aggregator makes
  * the cap a memory bound, not just a result filter, while producing the
  * exact same surviving groups. Plans as ObjectHashAggregate with partial
  * merge (map-side partials also capped at cap+1).
  *
  * The collected order is partition-dependent either way (collect_list's
  * is too); callers only use membership, never order.
  */
object CappedCollect {

  final case class Buf(var ids: Array[Long], var n: Int)

  private final class CappedIds(cap: Int) extends Aggregator[Long, Buf, Array[Long]] {
    require(cap >= 1 && cap < Int.MaxValue,
      s"cap must be in [1, Int.MaxValue) — got $cap (cap+1 must not overflow; " +
        "an 'uncapped' collect should use collect_list directly)")
    private val limit = cap + 1 // one past cap proves the overflow

    override def zero: Buf = Buf(Array.empty, 0)

    private def ensure(b: Buf, extra: Int): Unit = {
      val want = math.min(limit, b.n + extra)
      if (b.ids.length < want)
        b.ids = java.util.Arrays.copyOf(b.ids, math.max(want, math.min(limit, math.max(8, b.ids.length * 2))))
    }

    override def reduce(b: Buf, a: Long): Buf = {
      if (b.n < limit) { ensure(b, 1); b.ids(b.n) = a; b.n += 1 }
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      val take = math.min(limit - x.n, y.n)
      if (take > 0) {
        ensure(x, take)
        System.arraycopy(y.ids, 0, x.ids, x.n, take)
        x.n += take
      }
      x
    }

    override def finish(b: Buf): Array[Long] =
      if (b.n > cap) null else java.util.Arrays.copyOf(b.ids, b.n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** `cappedIds(cap)(col)` → array<bigint> of the group's values, or null
    * if the group has more than `cap` of them. */
  def cappedIds(cap: Int)(c: Column): Column = udaf(new CappedIds(cap)).apply(c)
}
