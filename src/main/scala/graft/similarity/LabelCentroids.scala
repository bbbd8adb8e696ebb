package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label centroids and the inter-class confusion map: the per-label mean
  * embedding is the class prototype (what a nearest-centroid classifier
  * serves, and what embedding-drift monitoring tracks release-to-release);
  * each label's nearest OTHER centroid by cosine is its most confusable
  * class — the pair a training-set curator inspects for label noise first.
  *
  * Scale shape (100 TB):
  *  - the centroid pass posexplodes vectors to (label, pos, val) and
  *    partially aggregates map-side, so the exchange carries ≤
  *    |labels|·dim summary rows per partition — never vectors;
  *  - everything downstream operates on the |labels|·dim centroid table
  *    (norms are a re-aggregation; the pairwise dot is a self-join on pos
  *    over that tiny table) — label cardinality is small by nature, so
  *    the confusion matrix is driver-trivial but computed declaratively.
  */
object LabelCentroids {

  /** (label, pos, m): mean value per label per dimension. */
  def centroids(vectors: DataFrame): DataFrame =
    vectors.filter(col("label").isNotNull && col("vec").isNotNull)
      .select(col("label"), posexplode(col("vec")).as(Seq("pos", "val")))
      .groupBy("label", "pos").agg(avg("val").as("m"))

  /** Per-label nearest other label by centroid cosine:
    * (label, nearest_label, sim). Ties break on the smaller label id. */
  def confusions(vectors: DataFrame): DataFrame = {
    val c = centroids(vectors)
    val norms = c.groupBy("label").agg(sum(col("m") * col("m")).as("n2"))
    val dots = c.as("a").join(c.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") =!= col("b.label"))
      .select(col("a.label").as("label"), col("b.label").as("other_label"),
        (col("a.m") * col("b.m")).as("prod"))
      .groupBy("label", "other_label").agg(sum("prod").as("dot"))
    val na = norms.select(col("label"), col("n2").as("na2"))
    val nb = norms.select(col("label").as("other_label"), col("n2").as("nb2"))
    val sims = dots.join(broadcast(na), Seq("label"))
      .join(broadcast(nb), Seq("other_label"))
      .select(col("label"), col("other_label"),
        (col("dot") / (sqrt(col("na2")) * sqrt(col("nb2")))).as("sim"))
    val w = Window.partitionBy("label")
      .orderBy(col("sim").desc, col("other_label").asc)
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("label"), col("other_label").as("nearest_label"), col("sim"))
  }
}
