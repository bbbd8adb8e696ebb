package graft.pipeline

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end prep: gate drops junk, dedup keeps one canonical per family, chunks flow") {
    val base = "the quick brown fox jumps over the lazy dog and then it runs to the barn for a rest"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup of 1 -> dropped by exact dedup
      (3L, "zz " + base.drop(4)), // near dup of 1 -> clustered, non-canonical
      (4L, "qqq www eee rrr"), // no stopwords -> gated out (lang unknown)
      (5L, "it is a fine day and the sun is out on the hill with a cat and a dog by it")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs)
    val kept = out.select("doc_id").distinct().as[Long].collect().sorted
    kept shouldBe Array(1L, 5L) // one canonical per family, junk gone
    // chunks carry the full text (single window here)
    out.filter($"doc_id" === 1L).select("chunk_text").as[String].collect()(0) shouldBe base
    out.select("n_tokens").as[Long].collect().foreach(_ should be > 0L)
  }
}
