package graft.dedup

import graft.SparkSpec

class BenchmarkLeakageSpec extends SparkSpec {
  import spark.implicits._

  test("full copy, partial quote, and clean item report 1.0 / partial / 0.0") {
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // fully copied below
      (2L, "one two three four five six"),         // only a prefix quoted
      (3L, "never seen anywhere at all ever")      // clean
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "intro words then alpha beta gamma delta epsilon zeta"),
      (102L, "quoting one two three here")
    ).toDF("doc_id", "text")
    val out = Decontaminate.benchmarkLeakage(corpus, bench)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getDouble(3) shouldBe 1.0
    out(1L).getLong(4) shouldBe 2L // both corpus docs carry it
    out(2L).getDouble(3) should (be > 0.0 and be < 1.0)
    out(2L).getLong(4) shouldBe 1L
    out(3L).getDouble(3) shouldBe 0.0
    out(3L).getLong(4) shouldBe 0L // clean items still appear, with zeros
  }

  test("m126 fixture: every planted bench item reports full leakage") {
    val out = graft.queries.CorpusQueries.benchmarkLeakage(spark, sf("sf0.001"))
      .collect()
    out.length shouldBe 50
    // each bench doc's exact copy is planted in the corpus
    out.foreach(_.getDouble(3) shouldBe 1.0)
  }
}
