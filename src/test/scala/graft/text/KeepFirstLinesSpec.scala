package graft.text

import graft.SparkSpec

class KeepFirstLinesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    LineDedup.keepFirstLines(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a shared line survives only in its earliest doc") {
    val out = run(
      1L -> "shared banner\nunique alpha",
      2L -> "shared banner\nunique beta",
      3L -> "unique gamma\nshared banner")
    out(1L) shouldBe (("shared banner\nunique alpha", 2L, 0L))
    out(2L) shouldBe (("unique beta", 2L, 1L))
    out(3L) shouldBe (("unique gamma", 2L, 1L))
  }

  test("within-doc repeats keep only the first occurrence") {
    val out = run(1L -> "echo\ncontent\necho\necho")
    out(1L) shouldBe (("echo\ncontent", 4L, 2L))
  }

  test("first occurrence is by (doc_id, line_no), not text order") {
    // doc 1's LAST line vs doc 2's FIRST line: doc 1 wins on doc_id
    val out = run(
      2L -> "contested line\nbeta",
      1L -> "alpha\ncontested line")
    out(1L)._1 shouldBe "alpha\ncontested line"
    out(2L)._1 shouldBe "beta"
  }

  test("a doc whose every line lost its race is absent") {
    val out = run(
      1L -> "only line",
      2L -> "only line")
    out.keySet shouldBe Set(1L)
  }

  test("keep-first and frequency policies disagree exactly on the first copy") {
    val docs = (1L to 12L).map(i => i -> s"boilerplate footer\nbody $i")
      .toDF("doc_id", "text")
    val freq = LineDedup.dedupLines(docs, minDocs = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = LineDedup.keepFirstLines(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // frequency: the footer is gone everywhere; keep-first: doc 1 keeps it
    freq(1L) shouldBe "body 1"
    first(1L) shouldBe "boilerplate footer\nbody 1"
    (2L to 12L).foreach { i =>
      freq(i) shouldBe s"body $i"
      first(i) shouldBe s"body $i"
    }
  }
}
