package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossPerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("docs unlike the reference score strictly higher perplexity") {
    val reference = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "the cat and the dog sat")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the cat sat on the rug"), // reference-like: seen bigrams
      (11L, "zq vw xj kp qz wv jx")    // nothing seen: pure backoff
    ).toDF("doc_id", "text")
    val out = NgramLm.scoreAgainst(corpus, NgramLm.bigramCounts(reference))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out(11L) should be > out(10L)
    out.values.foreach(_ should be >= 1.0)
  }

  test("unseen context degrades to the uniform 1/V, not a crash or a zero") {
    val reference = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq((10L, "zz yy xx ww")).toDF("doc_id", "text")
    val out = NgramLm.scoreAgainst(corpus, NgramLm.bigramCounts(reference))
      .collect()
    out.length shouldBe 1
    // V = 4 tokens in the trained slots; every corpus gram is unseen, so
    // p = 0.5/(0.5·4) = 1/4 per gram and perplexity is exactly 4
    out.head.getDouble(3) shouldBe 4.0 +- 1e-9
  }

  test("m124 fixture: reference docs are absent from the scored frame") {
    val ids = graft.queries.CorpusQueries.crossPerplexity(spark, sf("sf0.001"))
      .select(min(col("doc_id"))).collect().head.getLong(0)
    ids should be >= 100L
  }
}
