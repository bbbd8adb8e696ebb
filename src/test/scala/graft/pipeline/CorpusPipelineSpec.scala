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

  test("v2: PII-variant copies dedup only AFTER the scrub (stage order is load-bearing)") {
    val base = "the quick brown fox jumps over the lazy dog and then it runs to the barn for a rest"
    // Same content, per-doc PII — NOT byte-identical before redaction.
    val docs = Seq(
      (1L, s"$base contact alice@corp.example from 10.0.0.1"),
      (2L, s"$base contact bob@corp.example from 10.0.0.2"))
      .toDF("doc_id", "text")
    // v1 (no scrub): near-dup clustering catches them (shared shingles),
    // but exact dedup alone does NOT — fingerprints differ.
    val exactOnly = graft.dedup.ExactDedup.dedup(docs)
    exactOnly.count() shouldBe 2
    // v2: scrub collapses the PII to identical placeholders, the copies
    // fingerprint identically, and one canonical doc survives.
    val out = CorpusPipeline.prepareV2(docs)
    out.select("doc_id").distinct().as[Long].collect() shouldBe Array(1L)
    // placeholders made it into the shipped chunks (lowercased by collapse)
    out.select("chunk_text").as[String].collect().mkString(" ") should include("<email>")
  }

  test("v2: repetition runs are collapsed in shipped chunks") {
    val text = "the the the cat sat on a mat and it is a fine day for the cat " +
      "to sit on the mat with a dog and the dog sat too"
    val out = CorpusPipeline.prepareV2(Seq((1L, text)).toDF("doc_id", "text"))
    val chunk = out.orderBy("chunk_idx").select("chunk_text").as[String].collect().head
    chunk should startWith("the cat sat") // "the the the" collapsed
  }
}
