package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-noise mining by centroid margin — for every labeled vector,
  * cosine to its OWN class centroid vs the best cosine to any OTHER
  * class centroid; a negative margin (closer to another class's
  * prototype than to its own) is the classic first-pass mislabeled-
  * example flag a training-set curator reviews (the nearest-prototype
  * reduction of confident-learning-style label QA — Northcutt et al.
  * 2021 study the general framework; the centroid margin is the
  * standard cheap instantiation).
  *
  * Determinism: centroids are double means (the m49/m78 convention —
  * ulp-level partition noise, absorbed by the 6-dp oracle gate; not in
  * the invariance suite); the best-other selection orders on the m89
  * integer key (floor(cos·1e6), label) so rank ties cannot flip
  * between engines.
  *
  * Scale shape (100 TB): the K×dim centroid table and its norms are
  * BROADCAST; the per-vector pass posexplodes once and map-side
  * partial-aggregates to K rows per vector before its exchange (the
  * per-(id, candidate-label) dot products — never raw vectors); the
  * scored frame is pinned because own/other margins are two consumers.
  * Everything after is a per-id window over K rows.
  */
object LabelNoise {

  /** (id, label, cos_own, nearest_other, cos_other, margin, suspect) —
    * one row per labeled vector with at least one OTHER class present.
    * `suspect` = margin < 0. Zero-norm vectors or centroids yield null
    * cosines and a null margin (the /0 → null contract). */
  def marginReport(vectors: DataFrame): DataFrame = {
    val v = vectors.filter(col("label").isNotNull && col("vec").isNotNull)
    val cents = LabelCentroids.centroids(v)
    val cnorm = cents.groupBy("label").agg(sum(col("m") * col("m")).as("n2c"))
      .select(col("label").as("c_label"), col("n2c"))
    val ex = v.select(col("id"), col("label"),
      posexplode(col("vec")).as(Seq("pos", "val")))
    val dots = graft.Snapshot.pin(
      ex.join(broadcast(cents.select(col("label").as("c_label"), col("pos"), col("m"))),
          Seq("pos"))
        .groupBy("id", "label", "c_label")
        .agg(sum(col("val") * col("m")).as("dot"),
          sum(col("val") * col("val")).as("nv"))
        .join(broadcast(cnorm), Seq("c_label"))
        .select(col("id"), col("label"), col("c_label"),
          when(col("nv") > 0.0 && col("n2c") > 0.0,
            col("dot") / (sqrt(col("nv")) * sqrt(col("n2c")))).as("cos")),
      eager = true)
    val own = dots.filter(col("c_label") === col("label"))
      .select(col("id"), col("label"), col("cos").as("cos_own"))
    val w = Window.partitionBy("id")
      .orderBy(floor(col("cos") * lit(1e6)).cast("long").desc, col("c_label").asc)
    val best = dots.filter(col("c_label") =!= col("label"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("c_label").as("nearest_other"),
        col("cos").as("cos_other"))
    own.join(best, Seq("id"))
      .select(col("id"), col("label"), col("cos_own"), col("nearest_other"),
        col("cos_other"), (col("cos_own") - col("cos_other")).as("margin"),
        (col("cos_own") - col("cos_other") < 0.0).as("suspect"))
  }
}
