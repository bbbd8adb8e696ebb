package graft.dedup

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("identical docs produce identical fingerprint sets") {
    val d = docs((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
    val fps = Winnowing.fingerprints(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    fps(1L) shouldBe fps(2L)
    fps(1L).size should be >= 1
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // w=4 windows of k=3 shingles → any common 6-token run must yield at
    // least one common fingerprint even when its position shifts.
    val common = "p q r s t u"
    val d = docs(
      (1L, s"$common x1 y1 z1 w1 v1 u1"),
      (2L, s"a2 b2 c2 d2 e2 $common"))
    val fps = Winnowing.fingerprints(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    (fps(1L) intersect fps(2L)) should not be empty
  }

  test("unrelated docs share nothing; short docs collapse to one gram") {
    val d = docs((1L, "aa bb"), (2L, "cc dd"))
    val fps = Winnowing.fingerprints(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    fps(1L).size shouldBe 1 // < 3 tokens → single whole-text gram
    (fps(1L) intersect fps(2L)) shouldBe empty
  }

  test("fingerprints are distinct per doc and the plan has no exchange") {
    val d = docs((1L, "a a a a a a a a a a")) // all windows pick the same hash
    val out = Winnowing.fingerprints(d)
    out.count() shouldBe 1
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("differential: compiled pass == Column reference form") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog and more words here"),
      (2L, "short doc"),
      (3L, ""),
      (4L, "  padded   with  runs   of spaces  "),
      (5L, "exactly three tokens here"), // 2 shingles < w → single min
      (6L, (1 to 60).map(i => s"tok${i % 7}").mkString(" ")))
    val fast = Winnowing.fingerprints(d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val ref = Winnowing.fingerprintsColumnForm(d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    fast shouldBe ref
  }

  test("candidatePairs finds the planted near-dup via shared fingerprints") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, base),
      (2L, s"intro words here $base"), // shifted copy
      (3L, "completely different content with no overlap at all whatsoever"))
    val pairs = Winnowing.candidatePairs(d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }
}
