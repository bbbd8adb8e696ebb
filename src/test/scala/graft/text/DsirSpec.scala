package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val domain = "quantum flux entangled qubit lattice coherence"
  private val filler = "the cat sat on the mat and looked at the dog"

  test("docs matching the target distribution outscore docs that don't") {
    // target = ids 0..3 (domain text); raw pool adds filler docs and one
    // non-target doc that happens to carry the domain phrase
    val docs = ((0L to 3L).map(i => i -> s"intro words $domain") ++
      (4L to 9L).map(i => i -> s"$filler number $i") :+
      (10L -> s"stray copy $domain")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(docs, isTarget = col("doc_id") <= 3L,
      selectFrac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    val domainScores = (0L to 3L).map(out(_)._1) :+ out(10L)._1
    val fillerScores = (4L to 9L).map(out(_)._1)
    domainScores.min should be > fillerScores.max
    // the non-target domain carrier is selected on weight alone
    out(10L)._2 shouldBe 1L
    (4L to 9L).foreach(i => out(i)._2 shouldBe 0L)
  }

  test("bucket hash matches the oracle's base-16 parse of md5's tail") {
    // md5('the quick') = …f00 → 0xf00 = 3840 → % 1024 = 768 (verified
    // against DuckDB's strpos construction)
    val b = Seq("the quick").toDF("g")
      .select(Dsir.bucketOf(col("g"), 1024).as("b")).head.getLong(0)
    b shouldBe 768L
  }

  test("selectFrac controls the kept share") {
    val docs = (0L to 99L).map(i =>
      i -> (if (i < 10) s"target words $domain" else s"$filler row $i"))
      .toDF("doc_id", "text")
    val out = Dsir.importanceWeights(docs, isTarget = col("doc_id") < 10L,
      selectFrac = 0.2).cache()
    try {
      // strictly-above-threshold semantics: at most the asked share, and
      // never empty on a spread distribution
      val sel = out.filter(col("selected") === 1L).count()
      sel should be <= 20L
      sel should be > 0L
    } finally out.unpersist()
  }

  test("featureless docs (fewer than two tokens) are absent, not scored") {
    val docs = Seq(1L -> "single", 2L -> s"two words $domain")
      .toDF("doc_id", "text")
    val out = Dsir.importanceWeights(docs, isTarget = col("doc_id") === 2L)
    out.select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
  }
}
