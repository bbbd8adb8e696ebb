package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV — k minimum values sketch (Bar-Yossef et al. 2002; Beyer et al.
  * 2007, public): the MERGEABLE bounded-state summary for distinct
  * counts AND set operations, the capability the triad's other legs
  * lack — HLL unions but cannot intersect; KMV supports union,
  * intersection and Jaccard estimates between any two scopes, which is
  * what cross-source overlap planning (m60's exact card) needs at
  * 100 TB where the exact pairwise shingle join is the cost.
  *
  * State: the k smallest DISTINCT 48-bit md5 hashes of the group's
  * items (the [[HyperLogLog.hash48]] / gate hex12 convention, so DuckDB
  * recomputes identical hashes). A deterministic PURE FUNCTION of the
  * item set — insertion order, duplication and partitioning are all
  * invisible (unlike reservoir/Misra–Gries state), so sketches and
  * every estimate derived from them are bit-identical cross-engine and
  * under any layout, and the hash gate can certify the whole chain.
  *
  * Estimators (all replayed exactly):
  *  - distinct: |S| < k ⇒ the sketch IS the set (exact count);
  *    otherwise (k−1)·2⁴⁸/h₍ₖ₎ — the classic KMV estimator.
  *  - Jaccard(A,B): K = k smallest of S_A ∪ S_B (computable from the
  *    two sketches alone — the k smallest of a union are always inside
  *    the union of the per-set k smallest); ĵ = |{x ∈ K : x ∈ S_A ∧
  *    x ∈ S_B}| / |K|, the standard K-sample estimator.
  *
  * Scale shape: the aggregation buffer is a ≤ k sorted long array with
  * map-side partial merge (ObjectHashAggregate, the CappedCollect
  * plan); the exchange carries ≤ k longs per group whatever the corpus
  * size; merge across scopes is a k-bounded sorted-array merge —
  * associative, commutative, idempotent (spec-pinned). Pair cards read
  * sketches only: |groups|² pairs × k longs, never corpus data.
  */
object KmvSketch {

  /** Default sketch size — 256 hashes ≈ 6% standard error on distinct,
    * the classic k for overlap planning cards. */
  val DefaultK = 256

  final case class Buf(var hs: Array[Long], var n: Int)

  private final class KMin(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Buf = Buf(Array.empty, 0)

    override def reduce(b: Buf, h: Long): Buf = {
      val pos = java.util.Arrays.binarySearch(b.hs, 0, b.n, h)
      if (pos >= 0) b // already present — KMV state is a SET
      else {
        val ins = -pos - 1
        if (b.n < k) {
          if (b.hs.length == b.n)
            b.hs = java.util.Arrays.copyOf(b.hs,
              math.min(k, math.max(8, b.hs.length * 2)))
          System.arraycopy(b.hs, ins, b.hs, ins + 1, b.n - ins)
          b.hs(ins) = h; b.n += 1
        } else if (ins < k) { // smaller than the current k-th: displace it
          System.arraycopy(b.hs, ins, b.hs, ins + 1, k - ins - 1)
          b.hs(ins) = h
        }
        b
      }
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (y.n == 0) x
      else if (x.n == 0) y
      else {
        val out = new Array[Long](math.min(k, x.n + y.n))
        var i = 0; var j = 0; var m = 0
        while (m < out.length && (i < x.n || j < y.n)) {
          val takeX = j >= y.n || (i < x.n && x.hs(i) <= y.hs(j))
          val v = if (takeX) x.hs(i) else y.hs(j)
          if (takeX) i += 1 else j += 1
          // cross-side duplicate skip: each buffer is internally
          // duplicate-free, and ties (x head == y head) always take the
          // x side, so the only duplicate to skip is y's head after an
          // x take — the symmetric x-side case is unreachable
          if (takeX && j < y.n && y.hs(j) == v) j += 1
          out(m) = v; m += 1
        }
        x.hs = if (m == out.length) out else java.util.Arrays.copyOf(out, m)
        x.n = m
        x
      }
    }

    override def finish(b: Buf): Array[Long] =
      java.util.Arrays.copyOf(b.hs, b.n) // sorted ascending

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** `kMin(k)(hashCol)` → sorted array<bigint> of the group's k
    * smallest distinct hashes. Feed it [[HyperLogLog.hash48]] values
    * (or any 48-bit-bounded hash — the distinct estimator assumes the
    * [0, 2⁴⁸) range). */
  def kMin(k: Int = DefaultK)(c: Column): Column = udaf(new KMin(k)).apply(c)

  /** Distinct-count estimate from a sketch column: exact when the
    * sketch holds the whole set (size < k), else (k−1)·2⁴⁸/h₍ₖ₎. */
  def distinctEstimate(sketch: Column, k: Int = DefaultK): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * (1L << 48).toDouble) /
        greatest(element_at(sketch, k), lit(1L)).cast("double"))

  /** The k smallest of the UNION of two sketches — the merged sketch,
    * as a pure array expression (for pair cards over a joined sketch
    * table; the aggregator's own merge covers the groupBy path). */
  def unionSketch(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard estimate from two sketches: the K-sample estimator
    * |{x ∈ K : x ∈ A ∧ x ∈ B}| / |K| over K = [[unionSketch]]. */
  def jaccardEstimate(a: Column, b: Column, k: Int = DefaultK): Column = {
    val kk = unionSketch(a, b, k)
    size(filter(kk, x => array_contains(a, x) && array_contains(b, x)))
      .cast("double") / size(kk).cast("double")
  }
}
