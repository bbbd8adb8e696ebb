package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepeatedWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("a shared run ≥ w tokens is flagged in every document carrying it") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "completely unrelated content with no overlap at all here")
    ).toDF("doc_id", "text")
    val flagged = RepeatedWindows.flag(docs, w = 9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // The 9-token shared run yields exactly one 9-token window per doc:
    // at token offset 2 in doc 1, offset 0 in doc 2.
    flagged.toSet shouldBe Set((1L, 2L), (2L, 0L))
  }

  test("within-document repetition does not self-promote") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam eggs"),
      (2L, "totally different words in this one entirely unrelated")
    ).toDF("doc_id", "text")
    // Doc 1 repeats its own 2-token window many times, but no OTHER doc
    // shares it — nothing flags.
    RepeatedWindows.flag(docs, w = 2).count() shouldBe 0
  }

  test("documents shorter than w flag as whole-text duplicates") {
    val docs = Seq(
      (1L, "tiny dup"), (2L, "tiny dup"), (3L, "other text")
    ).toDF("doc_id", "text")
    val flagged = RepeatedWindows.flag(docs, w = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    flagged shouldBe Set((1L, 0L), (2L, 0L))
  }

  test("minDocs raises the bar") {
    val docs = Seq(
      (1L, "common phrase here"), (2L, "common phrase here"),
      (3L, "common phrase here"), (4L, "a pair only shared line"),
      (5L, "a pair only shared line")
    ).toDF("doc_id", "text")
    val strict = RepeatedWindows.flag(docs, w = 3, minDocs = 3).collect()
      .map(_.getLong(0)).toSet
    strict shouldBe Set(1L, 2L, 3L)
  }

  test("differential: compiled window pass ≡ Column form, real corpus + edge cases") {
    val real = graft.Tables.documents(spark, sf("sf0.001")).limit(200)
    val edges = Seq(
      (90001L, "  leading and trailing  "),
      (90002L, "UPPER Case MiXeD"),
      (90003L, "a\tb tab inside one token"),
      (90004L, "short"),
      (90005L, "exactly five tokens right here")
    ).toDF("doc_id", "text")
    val docs = real.select("doc_id", "text").unionByName(edges)
    for (w <- Seq(3, 30)) {
      val got = RepeatedWindows.windowFingerprints(docs, w)
        .as[(Long, Long, String)].collect().sorted.toSeq
      val want = RepeatedWindows.windowFingerprintsColumns(docs, w)
        .as[(Long, Long, String)].collect().sorted.toSeq
      got shouldBe want
    }
  }

  test("guards") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy RepeatedWindows.flag(docs, 0)
    an[IllegalArgumentException] should be thrownBy
      RepeatedWindows.flag(docs, 3, minDocs = 1)
  }

  test("differential: WithLen n_tokens ≡ size(split(lower(trim(text)), ' +')), real corpus + edges") {
    // The m133 short-span cap reads n_tokens off the window pass instead
    // of a second corpus tokenize (round-15 verdict) — this pin is what
    // makes that substitution safe: the compiled pass's toks.length must
    // equal the Column tokenizer on every document, including whitespace
    // edge cases (empty-after-trim splits to one '' token → 1).
    val real = graft.Tables.documents(spark, sf("sf0.001")).limit(200)
    val edges = Seq(
      (90001L, "  leading and trailing  "),
      (90002L, "   "),
      (90003L, ""),
      (90004L, "short"),
      (90005L, "a\tb tab inside one token")
    ).toDF("doc_id", "text")
    val docs = real.select("doc_id", "text").unionByName(edges)
    val got = RepeatedWindows.windowFingerprintsRawWithLen(docs, 5)
      .select("doc_id", "n_tokens").distinct()
      .as[(Long, Long)].collect().sorted.toSeq
    val want = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
          .split(lower(trim(col("text"))), " +")).cast("long"))
      .distinct().as[(Long, Long)].collect().sorted.toSeq
    got shouldBe want
    // n_tokens is constant per document (one value per doc_id)
    got.map(_._1).distinct.length shouldBe got.length
  }
}
