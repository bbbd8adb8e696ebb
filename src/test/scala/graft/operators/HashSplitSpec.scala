package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashSplitSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def corpus(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  test("every row gets exactly one split; fractions approximately honored") {
    val r = HashSplit.assign(corpus(20000), "doc_id", fracs)
      .groupBy("split").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    r.values.sum shouldBe 20000
    r("train").toDouble / 20000 shouldBe 0.8 +- 0.02
    r("val").toDouble / 20000 shouldBe 0.1 +- 0.02
    r("test").toDouble / 20000 shouldBe 0.1 +- 0.02
  }

  test("assignment is per-key stable: growing the corpus never reassigns") {
    val small = HashSplit.assign(corpus(1000), "doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = HashSplit.assign(corpus(5000), "doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (k, s) => grown(k) shouldBe s }
  }

  test("deterministic across partitionings") {
    val a = HashSplit.assign(corpus(2000).repartition(13), "doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    val b = HashSplit.assign(corpus(2000).coalesce(1), "doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    a shouldBe b
  }

  test("plan is a shuffle-free projection") {
    val plan = HashSplit.assign(corpus(100), "doc_id", fracs)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("fractions must be positive and sum to 1") {
    an[IllegalArgumentException] should be thrownBy
      HashSplit.assign(corpus(10), "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      HashSplit.assign(corpus(10), "doc_id", Seq("a" -> 1.2, "b" -> -0.2))
  }

  test("single split assigns everything to it") {
    HashSplit.assign(corpus(50), "doc_id", Seq("all" -> 1.0))
      .select("split").distinct().as[String].collect() shouldBe Array("all")
  }
}
