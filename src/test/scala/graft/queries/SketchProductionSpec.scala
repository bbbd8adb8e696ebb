package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The sketch tier's PRODUCTION modes (m155/m156, verdict r19 #4): the
  * m149/m152 certificate legs are the corpus-sized aggregates the
  * sketches replace at 100 TB, so the production rows run WITHOUT them
  * — which means their outputs can no longer be checked against an
  * in-query exact column. This spec supplies the missing cross-check:
  * each production output is recomputed independently from the exact
  * corpus (the certificate the query no longer carries), so the
  * certified and production modes are pinned to the same sketch. */
class SketchProductionSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def shingles(c: org.apache.spark.sql.Column) =
    graft.dedup.NgramJaccard.wordShingleSet(c, lit(3))

  test("m155: watchlist is the min-doc_id document's distinct shingles, first 20 by gram order") {
    val out = CorpusQueries.cmsFrequencyProduction(spark, dir).collect()
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val firstId = docs.agg(min("doc_id")).head().getLong(0)
    val expected = docs.filter(col("doc_id") === firstId)
      .select(explode(shingles(col("text"))).as("gram"))
      .filter(col("gram") =!= "")
      .distinct().collect().map(_.getString(0)).sorted.take(20)
    out.map(_.getString(0)).sorted shouldBe expected.sorted
    out.length should be <= 20
  }

  test("m155: every production estimate >= the exact corpus occurrence count (one-sidedness survives dropping the certificate)") {
    val out = CorpusQueries.cmsFrequencyProduction(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out should not be empty
    // exact occurrence counts over the SAME stream m149 certifies
    // (duplicates included — frequency semantics, not set semantics)
    val t = col("t")
    def at(i: org.apache.spark.sql.Column) = element_at(t, i)
    val exact = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(split(lower(trim(col("text"))), " +").as("t"))
      .select(explode(
        // explicit functions.size: scalatest's `size` matcher shadows it
        when(org.apache.spark.sql.functions.size(t) < 3, array(concat_ws(" ", t)))
          .otherwise(transform(sequence(lit(1), org.apache.spark.sql.functions.size(t) - 2),
            i => concat_ws(" ", at(i), at(i + 1), at(i + 2))))).as("gram"))
      .filter(col("gram") =!= "")
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (gram, est) =>
      withClue(s"$gram: ") { est should be >= exact.getOrElse(gram, 0L) }
    }
  }

  test("m156: pair counts equal an independent exact recomputation; sketch policy prunes a superset of the exact policy") {
    val tau = 8L
    val row = CorpusQueries.cmsPruneProduction(spark, dir, tau).head()
    val gd = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(shingles(col("text"))).as("gram"))
      .filter(col("gram") =!= "")
    // n_pairs is the (doc, gram) stream size
    row.getAs[Long]("n_pairs") shouldBe gd.count()
    // n_pairs_pruned re-derived through the OPERATOR's own estimate
    // path (CountMin.estimate over the df table) — the collected-array
    // broadcast in the query must agree with the join-based probe
    val dfT = gd.groupBy("gram").agg(count(lit(1)).as("df"))
    val sketch = graft.operators.CountMin.merge(
      graft.operators.CountMin.counters(gd, Seq.empty, col("gram")))
    val est = graft.operators.CountMin.estimate(sketch, dfT, "gram")
    val joined = dfT.join(est, Seq("gram")).collect()
      .map(r => (r.getAs[Long]("df"), r.getAs[Long]("cms_estimate")))
    val expectedPruned = joined.collect {
      case (df, e) if e > tau => df
    }.sum
    row.getAs[Long]("n_pairs_pruned") shouldBe expectedPruned
    // one-sidedness consequence: the sketch policy can only over-prune
    val exactPruned = joined.collect { case (df, _) if df > tau => df }.sum
    row.getAs[Long]("n_pairs_pruned") should be >= exactPruned
  }

  test("m156: the policy count is partition-invariant (integer cells, integer counts)") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "2")
      val a = CorpusQueries.cmsPruneProduction(spark, dir).collect().map(_.toSeq)
      conf.set("spark.sql.shuffle.partitions", "13")
      val b = CorpusQueries.cmsPruneProduction(spark, dir).collect().map(_.toSeq)
      a shouldBe b
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }
}
