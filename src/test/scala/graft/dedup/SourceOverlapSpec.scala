package graft.dedup

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("shared shingles between two sources produce one symmetric-free pair") {
    val docs = Seq(
      // s1 and s2 share exactly the shingle "x y z"; s3 is disjoint.
      (0L, "x y z a", "s1"),   // shingles: "x y z", "y z a"
      (1L, "x y z b", "s2"),   // shingles: "x y z", "y z b"
      (2L, "p q r", "s3")      // shingle:  "p q r"
    ).toDF("doc_id", "text", "source")
    val rows = SourceOverlap.overlapMatrix(docs).collect()
    rows.length shouldBe 1
    val r = rows(0)
    r.getString(0) shouldBe "s1"
    r.getString(1) shouldBe "s2"
    r.getLong(2) shouldBe 2L       // grams_a
    r.getLong(3) shouldBe 2L       // grams_b
    r.getLong(4) shouldBe 1L       // n_shared
    r.getDouble(5) shouldBe 1.0 / 3.0 +- 1e-12  // 1 / (2+2-1)
  }

  test("null-source docs are excluded by contract, not by collect_set accident") {
    // Pins the r10-advice fix: a null source must neither form pairs nor
    // leak into the per-source gram totals of the named sources.
    val docs = Seq(
      (0L, "x y z a", "s1"),
      (1L, "x y z b", "s2"),
      (2L, "x y z c", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "source")
    val rows = SourceOverlap.overlapMatrix(docs).collect()
    rows.length shouldBe 1 // only (s1, s2); nothing involving the null slice
    rows(0).getString(0) shouldBe "s1"
    rows(0).getString(1) shouldBe "s2"
    rows(0).getLong(2) shouldBe 2L // s1's total unaffected by the null doc
    rows(0).getLong(3) shouldBe 2L
  }

  test("identical sources have jaccard 1; duplicate docs inside a source don't inflate counts") {
    val docs = Seq(
      (0L, "a b c d", "s1"),
      (1L, "a b c d", "s1"),   // same shingles, distinct-set unchanged
      (2L, "a b c d", "s2")
    ).toDF("doc_id", "text", "source")
    val r = SourceOverlap.overlapMatrix(docs).collect()(0)
    r.getLong(2) shouldBe 2L   // "a b c", "b c d"
    r.getLong(3) shouldBe 2L
    r.getLong(4) shouldBe 2L
    r.getDouble(5) shouldBe 1.0 +- 1e-12
  }

  test("short docs shingle as whole text; empty docs contribute nothing") {
    val docs = Seq(
      (0L, "hi there", "s1"),  // < w tokens -> one whole-text shingle
      (1L, "hi there", "s2"),
      (2L, "", "s1"),
      (3L, null.asInstanceOf[String], "s2")
    ).toDF("doc_id", "text", "source")
    val r = SourceOverlap.overlapMatrix(docs).collect()(0)
    r.getLong(2) shouldBe 1L
    r.getLong(4) shouldBe 1L
    r.getDouble(5) shouldBe 1.0 +- 1e-12
  }
}
