package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // 30-token windows are unwieldy in fixtures; the operator is
  // width-generic, so the spec pins semantics at w = 3.
  private val W = 3

  test("a shared >= w run is cut from every copy; unique text survives") {
    val shared = "alpha beta gamma delta" // 4 tokens: two overlapping 3-windows
    val out = SpanScrub.scrub(docs(
      1L -> s"one two $shared",
      2L -> s"$shared nine ten"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    // Coverage is the UNION of flagged stride-1 windows: the whole 4-token
    // run disappears, not just one window of it.
    out(1L).getString(3) shouldBe "one two"
    out(2L).getString(3) shouldBe "nine ten"
    out(1L).getLong(1) shouldBe 6L
    out(1L).getLong(2) shouldBe 4L
  }

  test("a doc shorter than w duplicated elsewhere scrubs to empty") {
    val out = SpanScrub.scrub(docs(
      1L -> "hi there",
      2L -> "hi there",
      3L -> "completely different words here"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getString(3) shouldBe ""
    out(1L).getLong(2) shouldBe out(1L).getLong(1) // all tokens removed
    out(2L).getString(3) shouldBe ""
    out(3L).getString(3) shouldBe "completely different words here"
    out(3L).getLong(2) shouldBe 0L
  }

  test("within-doc repetition alone does not scrub (distinct-doc frequency)") {
    val out = SpanScrub.scrub(docs(
      1L -> "spam spam spam spam spam spam",
      2L -> "other text entirely different here"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(2) shouldBe 0L
    out(1L).getString(3) shouldBe "spam spam spam spam spam spam"
  }

  test("accounting: kept token count = n_tokens - n_removed, casing/spacing normalized") {
    val out = SpanScrub.scrub(docs(
      1L -> "  A  b c d e f  ",
      2L -> "a b c x y z"), w = W).collect()
    out.foreach { r =>
      val keptToks =
        if (r.getString(3).isEmpty) 0L
        else r.getString(3).split(" ").length.toLong
      keptToks shouldBe r.getLong(1) - r.getLong(2)
    }
    // doc 1's "a b c" (lowercased, space runs collapsed) matches doc 2's —
    // exactly that 3-token window goes, from both docs
    val m = out.map(r => r.getLong(0) -> r).toMap
    m(1L).getString(3) shouldBe "d e f"
    m(2L).getString(3) shouldBe "x y z"
  }

  test("null-text docs are excluded, not crashed on") {
    val withNull = Seq((1L, "a b c d"), (2L, "a b c d"))
      .toDF("doc_id", "text")
      .unionByName(Seq(3L).toDF("doc_id").withColumn("text", lit(null).cast("string")))
    val out = SpanScrub.scrub(withNull, w = W).collect()
    out.map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
  }

  // ---- keepFirstSpans (m97): the keep-one-copy policy ----------------

  test("keep-first: the earliest copy survives verbatim, later copies scrub to empty") {
    val out = SpanScrub.keepFirstSpans(docs(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta",
      3L -> "alpha beta gamma delta"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getString(3) shouldBe "alpha beta gamma delta"
    out(1L).getLong(2) shouldBe 0L
    out(2L).getString(3) shouldBe ""
    out(3L).getString(3) shouldBe ""
  }

  test("keep-first: a within-doc repeat of a cross-doc span loses to the doc's own first copy") {
    val out = SpanScrub.keepFirstSpans(docs(
      1L -> "x a b c y a b c z",
      2L -> "q a b c r"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    // winner fp("a b c") = (doc 1, idx 1); the idx-5 repeat AND doc 2's
    // copy are both later occurrences
    out(1L).getString(3) shouldBe "x a b c y z"
    out(2L).getString(3) shouldBe "q r"
  }

  test("keep-first: mutated copy keeps only its changed head (shared tail is a later copy)") {
    val out = SpanScrub.keepFirstSpans(docs(
      1L -> "one two three four five six",
      2L -> "ZZZ two three four five six"), w = W).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(2) shouldBe 0L // every shared window's winner is doc 1
    out(2L).getString(3) shouldBe "zzz"
  }

  test("keep-first: exactly one copy of each repeated span remains corpus-wide") {
    val corpus = docs(
      1L -> "u1 u2 common1 common2 common3 common4 u3",
      2L -> "v1 common1 common2 common3 common4 v2 v3",
      3L -> "common1 common2 common3 common4",
      4L -> "w1 w2 w3 w4 w5 w6 w7")
    val kept = SpanScrub.keepFirstSpans(corpus, w = W)
      .filter(col("scrubbed_text") =!= "")
      .select(col("doc_id"), col("scrubbed_text").as("text"))
    // re-flagging the rebuilt corpus finds no cross-doc repeated window:
    // the policy left ONE copy, not zero and not several
    RepeatedWindows.flag(kept, w = W).count() shouldBe 0L
    // and the winner doc still carries the span
    kept.filter(col("doc_id") === 1L).collect()(0).getString(1) should
      include("common1 common2 common3 common4")
  }

  test("scrubbed corpus no longer contains any flagged repeated window") {
    // The m42/m82 contract: re-running the FLAG pass on the scrubbed text
    // finds no cross-doc repeated window among docs that were actually cut
    // (the removal really removed the repetition it flagged). Docs scrubbed
    // to '' collapse to a shared empty fingerprint — exclude them, that
    // mass is exact-dedup's job (same policy as the n-gram operators).
    val corpus = docs(
      1L -> "u1 u2 common1 common2 common3 common4 u3",
      2L -> "v1 common1 common2 common3 common4 v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6 w7")
    val scrubbed = SpanScrub.scrub(corpus, w = W)
      .filter(col("scrubbed_text") =!= "")
      .select(col("doc_id"), col("scrubbed_text").as("text"))
    RepeatedWindows.flag(scrubbed, w = W).count() shouldBe 0L
  }
}
