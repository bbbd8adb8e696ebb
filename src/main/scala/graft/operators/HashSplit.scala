package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment by key hash — the split
  * step every training pipeline runs before anything else. Each row's
  * split is a pure function of its key (md5, the engine-portable hash used
  * by every sampler here), so the assignment is reproducible across runs,
  * partitionings, engines, AND corpus versions: adding or removing
  * documents never reassigns a surviving document, which is what keeps
  * eval sets stable as the corpus grows (a rank/ntile split would reshuffle
  * everything on every ingest).
  *
  * Mechanics: the first 4 hex chars of md5(key) are a uniform draw from
  * 65536 buckets; cumulative fraction thresholds become 4-char hex-string
  * literals compared lexicographically — hex strings of equal length order
  * exactly like their numeric values, so the whole operator is one
  * codegen'd CASE over a string compare. Zero shuffle, zero state, and the
  * identical expression replays in the DuckDB oracle.
  */
object HashSplit {

  /** Add a `split` column: each (name, fraction) gets ⌈fraction·65536⌉/65536
    * of the hash space, in order; fractions must sum to 1 (±1e-9). */
  def assign(df: DataFrame, keyCol: String,
             fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = substring(md5(col(keyCol).cast("string").cast("binary")), 1, 4)
    val thresholds = fractions.scanLeft(0.0)(_ + _._2).tail.dropRight(1)
      .map(f => f"${math.round(f * 65536).toInt}%04x")
    val cased = fractions.init.zip(thresholds)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), t)) =>
        Some(acc.fold(when(h < lit(t), name))(_.when(h < lit(t), name)))
      }
    val split = cased.fold(lit(fractions.last._1))(_.otherwise(fractions.last._1))
    df.withColumn("split", split)
  }

  /** The DuckDB replay of [[assign]] for a BIGINT key — kept adjacent so
    * the two expressions can only drift visibly. */
  def oracleSqlExpr(keyCol: String, fractions: Seq[(String, Double)]): String = {
    val h = s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 4)"
    val thresholds = fractions.scanLeft(0.0)(_ + _._2).tail.dropRight(1)
      .map(f => f"${math.round(f * 65536).toInt}%04x")
    val whens = fractions.init.zip(thresholds)
      .map { case ((name, _), t) => s"WHEN $h < '$t' THEN '$name'" }
      .mkString(" ")
    s"(CASE $whens ELSE '${fractions.last._1}' END)"
  }
}
