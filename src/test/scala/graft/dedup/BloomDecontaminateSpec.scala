package graft.dedup

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val bench = docs(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
  private val corpus = docs(
    (10L, "the quick brown fox jumps over the lazy dog today"), // near-copy
    (11L, "pack my box with five dozen liquor jugs"),           // exact copy
    (12L, "completely unrelated text about glaciers and permits"),
    (13L, "the quick brown cat naps all day long"))             // partial

  test("matches the exact operator's output row for row") {
    val exact = Decontaminate.contaminated(corpus, bench)
      .orderBy("doc_id").collect().toSeq
    val bloom = BloomDecontaminate.contaminated(corpus, bench)
      .orderBy("doc_id").collect().toSeq
    bloom shouldBe exact
    bloom.map(_.getLong(0)) should contain allOf (10L, 11L)
  }

  test("false positives never survive: exact output even at fpp 0.4") {
    val exact = Decontaminate.contaminated(corpus, bench, ratioThreshold = 0.1)
      .orderBy("doc_id").collect().toSeq
    val bloom = BloomDecontaminate
      .contaminated(corpus, bench, ratioThreshold = 0.1, fpp = 0.4)
      .orderBy("doc_id").collect().toSeq
    bloom shouldBe exact
  }

  test("the bloom probe accepts planted members and the plan carries might_contain") {
    val grams = bench
      .select(explode(NgramJaccard.wordShingleHashSet(col("text"), lit(3))).as("gram"))
      .distinct()
    val blob = BloomDecontaminate.benchmarkBloom(grams, fpp = 0.01)
    val planted = grams.limit(5)
      .withColumn("hit", GraftFunctions.bloomContains(spark, lit(blob), col("gram")))
    // no false negatives, ever — the Bloom contract
    planted.select("hit").as[Boolean].collect().foreach(_ shouldBe true)
    val plan = BloomDecontaminate.contaminated(corpus, bench)
      .queryExecution.executedPlan.toString
    plan should include("might_contain")
  }

  test("docs with no grams are absent (empty/null text policy matches m25)") {
    val weird = Seq((20L, Option("")), (21L, Option.empty[String]),
      (22L, Option("the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    val out = BloomDecontaminate.contaminated(weird, bench, ratioThreshold = 0.0)
    out.select("doc_id").as[Long].collect() shouldBe Array(22L)
  }
}
