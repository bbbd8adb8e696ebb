package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantile sketch — the third leg of
  * the sketch triad ([[HyperLogLog]] distinct, [[CountMin]] frequency,
  * this one quantiles): per group, W = 1024 integer bucket counts over
  * the GLOBAL [lo, hi] integer value range, so the exchange is bounded
  * by groups × W integer rows whatever the corpus size, per-group
  * sketches merge into any coarser scope by elementwise ADD, and a
  * quantile estimate reads the cumulative counts — with a HARD
  * deterministic error bound: the estimate is the true quantile's
  * bucket upper bound, so |estimate − exact| < ceil(R / W) where R =
  * hi − lo + 1 (spec-pinned, certified per probe in the m150 card).
  * This is the operator that replaces a corpus-wide sort (what an
  * exact per-group quantile needs — m132's GroupedRanks path) when an
  * εR answer is enough; unlike t-digest/KLL (randomized, engine-
  * internal state) every number here is exact integer arithmetic, so
  * sketches and estimates are bit-deterministic cross-engine and under
  * any partitioning.
  *
  * Bucketing is PURE INTEGER: bucket(v) = (v − lo)·W div R ∈ [0, W−1],
  * upper bound ub(b) = lo + ceil((b+1)·R/W) − 1 = lo + ((b+1)·R + W −
  * 1) div W − 1 — `div` in both engines, no float boundary anywhere
  * (products ≤ |range|·1024, far inside int64). The [lo, hi] frame is
  * one 1-row broadcast aggregate (the two-pass shape every range-
  * partitioned operator here already uses).
  */
object HistogramSketch {

  /** Buckets per group: error bound ceil(R/1024) ≈ 0.1% of the range. */
  val Width = 1024

  /** The global integer value range as a 1-row frame (lo, hi, r) —
    * cross-joined (broadcast) into build and estimate so no literal is
    * baked at plan time. Empty input → zero rows (consumers collapse
    * to empty, the empty-corpus convention). */
  def valueRange(rows: DataFrame, valueCol: Column): DataFrame =
    rows.agg(min(valueCol).cast("long").as("lo"),
        max(valueCol).cast("long").as("hi"))
      .filter(col("lo").isNotNull)
      .select(col("lo"), col("hi"), (col("hi") - col("lo") + 1L).as("r"))

  /** Bucket counts: one (groupCols…, bucket, cnt) row per hit bucket.
    * `range` is [[valueRange]]'s 1-row frame (pass the SAME frame to
    * [[quantiles]] — a sketch is only mergeable with sketches built on
    * the same range). NULL values are dropped HERE (the CountMin null
    * rule): a nullable valueCol must not mint a null-bucket row that
    * inflates n and diverges from SQL's NULL-dropping aggregate
    * arithmetic — the operator owns the rule, not its callers. */
  def counters(rows: DataFrame, groupCols: Seq[String], valueCol: Column,
               range: DataFrame): DataFrame =
    rows.filter(valueCol.isNotNull)
      .select(groupCols.map(col) :+ valueCol.cast("long").as("v_"): _*)
      .crossJoin(broadcast(range))
      .select(groupCols.map(col) :+
        expr(s"((v_ - lo) * $Width) div r").as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Union of sketches by elementwise ADD (associative/commutative —
    * exactly the counter table of the unioned input, spec-pinned). */
  def merge(cnts: DataFrame, keepCols: Seq[String] = Seq.empty): DataFrame =
    cnts.groupBy(keepCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Nearest-rank pick over a (key, cnt) table: for each q, the
    * smallest key whose cumulative count reaches ceil(q·n) — one
    * bounded key-sorted fold (keys are W buckets for the sketch, the
    * realized value set for the exact certificate), no corpus-sized
    * sort anywhere. Output: (q, n, k). Empty input → empty. */
  private def pickByRank(kv: DataFrame, keyCol: String,
                         qs: Seq[Double],
                         groupCols: Seq[String] = Seq.empty): DataFrame = {
    val s = kv.sparkSession
    import s.implicits._
    val qdf = qs.toDF("q")
    kv.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(keyCol).as("k"), col("cnt"))))
        .as("ks"), sum(col("cnt")).as("n"))
      .filter(col("n").isNotNull)
      .crossJoin(broadcast(qdf))
      // rank = ceil(q·n), identical IEEE multiply + ceil in both
      // engines; the fold carries (cum, hit) and keeps the FIRST key
      // whose running count reaches the rank
      .withColumn("rank",
        greatest(ceil(col("q") * col("n").cast("double")).cast("long"), lit(1L)))
      .withColumn("k",
        // an explicit found FLAG, not a sentinel key: keys are values
        // here on the exact path and may legitimately be negative — a
        // `hit >= 0` latch would overwrite the pick with every later
        // key whenever the picked value was negative (review r17b)
        aggregate(col("ks"),
          struct(lit(0L).as("cum"), lit(false).as("found"), lit(0L).as("hit")),
          (acc, x) => {
            val cum = acc.getField("cum") + x.getField("cnt")
            struct(cum.as("cum"),
              (acc.getField("found") || cum >= col("rank")).as("found"),
              when(acc.getField("found"), acc.getField("hit"))
                .when(cum >= col("rank"), x.getField("k"))
                .otherwise(lit(0L)).as("hit"))
          }).getField("hit"))
      .select((groupCols.map(col) ++ Seq(col("q"), col("n"), col("k"))): _*)
  }

  /** Quantile estimates from a (bucket, cnt) sketch: (q, n, est) where
    * est = the picked bucket's upper bound — the deterministic
    * ≤ ceil(R/W)−1 overshoot the card certifies. */
  def quantiles(sketch: DataFrame, range: DataFrame,
                qs: Seq[Double]): DataFrame =
    quantilesBy(sketch, range, qs, Seq.empty)

  /** Per-group quantile estimates from a (groupCols…, bucket, cnt)
    * sketch — the m151 consumer path: each group's fold is bounded by
    * W buckets, so the whole read is |groups|·W rows, never a
    * corpus-sized sort. All groups must share ONE `range` frame (a
    * sketch is only mergeable/comparable on a common bucketing). */
  def quantilesBy(sketch: DataFrame, range: DataFrame, qs: Seq[Double],
                  groupCols: Seq[String]): DataFrame =
    pickByRank(sketch, "bucket", qs, groupCols)
      .crossJoin(broadcast(range))
      .select((groupCols.map(col) ++ Seq(col("q"), col("n"),
        (col("lo") + expr(s"((k + 1) * r + ${Width - 1}) div $Width") - 1L)
          .as("est"))): _*)

  /** EXACT nearest-rank quantiles from a (v, cnt) value-count table —
    * the certificate side of the m150 card (realized-value-bounded
    * fold; at 100 TB this is the thing the sketch replaces): (q, n,
    * exact). */
  def exactQuantiles(valueCounts: DataFrame, qs: Seq[Double]): DataFrame =
    exactQuantilesBy(valueCounts, qs, Seq.empty)

  /** Per-group exact nearest-rank quantiles from a (groupCols…, v, cnt)
    * table — m151's certificate side. */
  def exactQuantilesBy(valueCounts: DataFrame, qs: Seq[Double],
                       groupCols: Seq[String]): DataFrame =
    pickByRank(valueCounts, "v", qs, groupCols)
      .select((groupCols.map(col) ++
        Seq(col("q"), col("n"), col("k").as("exact"))): _*)
}
