package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("topBigramsOver: adjacent pairs only, count ties broken by gram") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: a b, b a, a b, b c
      (2L, "b c"),       // b c
      (3L, "x")          // single token → no bigrams
    ).toDF("doc_id", "text")
    val r = CorpusQueries.topBigramsOver(docs, k = 3)
      .as[(String, Long)].collect().toSeq
    r shouldBe Seq(("a b", 2L), ("b c", 2L), ("b a", 1L))
  }

  test("topBigramsOver: empty and null text yield no grams") {
    val docs = Seq((1L, Option("")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    CorpusQueries.topBigramsOver(docs).count() shouldBe 0
  }

  test("topBigrams plan aggregates before the exchange (partial agg)") {
    val plan = CorpusQueries.topBigrams(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // partial + final HashAggregate pair around the gram exchange, and the
    // top-k runs as TakeOrderedAndProject (never a global sort).
    plan.sliding("HashAggregate".length).count(_ == "HashAggregate") should be >= 2
    plan should include("TakeOrderedAndProject")
    plan should not include "GlobalSort"
  }
}
