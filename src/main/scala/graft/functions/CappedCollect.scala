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

  final case class IdSig(id: Long, sig: Long)
  final case class Buf2(var ids: Array[Long], var sigs: Array[Long], var n: Int)

  /** [[CappedIds]] over (id, payload) pairs — the bucket list variant that
    * lets a verify step run INSIDE the bucket expansion instead of
    * re-joining payloads by id afterwards (SimHash carries the 64-bit
    * signature this way: the candidate set then never shuffles — only
    * verified survivors do). Same cap-as-memory-bound contract: the
    * buffer never holds more than cap+1 entries, over-cap groups finish
    * null. */
  private final class CappedIdSigs(cap: Int)
      extends Aggregator[(Long, Long), Buf2, Array[IdSig]] {
    require(cap >= 1 && cap < Int.MaxValue,
      s"cap must be in [1, Int.MaxValue) — got $cap")
    private val limit = cap + 1

    override def zero: Buf2 = Buf2(Array.empty, Array.empty, 0)

    private def ensure(b: Buf2, extra: Int): Unit = {
      val want = math.min(limit, b.n + extra)
      if (b.ids.length < want) {
        val cap2 = math.max(want, math.min(limit, math.max(8, b.ids.length * 2)))
        b.ids = java.util.Arrays.copyOf(b.ids, cap2)
        b.sigs = java.util.Arrays.copyOf(b.sigs, cap2)
      }
    }

    override def reduce(b: Buf2, a: (Long, Long)): Buf2 = {
      if (b.n < limit) {
        ensure(b, 1); b.ids(b.n) = a._1; b.sigs(b.n) = a._2; b.n += 1
      }
      b
    }

    override def merge(x: Buf2, y: Buf2): Buf2 = {
      val take = math.min(limit - x.n, y.n)
      if (take > 0) {
        ensure(x, take)
        System.arraycopy(y.ids, 0, x.ids, x.n, take)
        System.arraycopy(y.sigs, 0, x.sigs, x.n, take)
        x.n += take
      }
      x
    }

    override def finish(b: Buf2): Array[IdSig] =
      if (b.n > cap) null
      else Array.tabulate(b.n)(i => IdSig(b.ids(i), b.sigs(i)))

    override def bufferEncoder: Encoder[Buf2] = Encoders.product[Buf2]
    override def outputEncoder: Encoder[Array[IdSig]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[IdSig]]()
  }

  /** `cappedIdSigs(cap)(idCol, sigCol)` → array<struct<id,sig>> of the
    * group's (id, payload) pairs, or null past `cap`. */
  def cappedIdSigs(cap: Int)(id: Column, sig: Column): Column =
    udaf(new CappedIdSigs(cap)).apply(id, sig)
}
