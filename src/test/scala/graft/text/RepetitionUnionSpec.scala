package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

/** m109 — paper-exact position-union repetition card. The hand-checks
  * pin exactly where the union semantics DIVERGE from m93's char-mass
  * form: overlapping occurrences are counted once here, count×length
  * there. */
class RepetitionUnionSpec extends SparkSpec {
  import spark.implicits._

  private def card(rows: (Long, String)*): Map[Long, Row] =
    TextOps.repetitionRulesUnion(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  private def massCard(rows: (Long, String)*): Map[Long, Row] =
    TextOps.repetitionRules(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("non-overlapping top gram: union equals the mass form") {
    // "a b a b a b": joined len 11; top 2-gram "a b" (count 3, len 3) at
    // char starts 0/4/8 — disjoint, so union = 9 = count×len
    val r = card((0L, "a b a b a b"))(0L)
    r.getAs[Double]("top_2") shouldBe (9.0 / 11.0)
    massCard((0L, "a b a b a b"))(0L).getAs[Double]("top_2") shouldBe (9.0 / 11.0)
  }

  test("overlapping top gram counts each char once where the mass form double-counts") {
    // "x a a a y z w q": joined len 15; "a a" occurs at char starts 2 and
    // 4 (token pos 1, 2) — the occurrences overlap on [4,5), union = 5;
    // the mass form scores 2×3 = 6
    val doc = (1L, "x a a a y z w q")
    card(doc)(1L).getAs[Double]("top_2") shouldBe (5.0 / 15.0)
    massCard(doc)(1L).getAs[Double]("top_2") shouldBe (6.0 / 15.0)
  }

  test("overlapping duplicate 5-grams: union is the merged interval, never past the text length") {
    // "a a a a a a b c d": joined len 17; the 5-gram "a a a a a" occurs at
    // char starts 0 and 2 (len 9) — union [0,11) = 11; the mass form
    // scores 2×9 = 18 and needs its 1.0 cap
    val doc = (2L, "a a a a a a b c d")
    card(doc)(2L).getAs[Double]("dup_5") shouldBe (11.0 / 17.0)
    massCard(doc)(2L).getAs[Double]("dup_5") shouldBe 1.0
  }

  test("a fully periodic doc saturates at exactly 1.0 — no cap needed") {
    // every position of "a a a a a a a" is covered by a duplicated 2-gram
    val r = card((3L, "a a a a a a a"))(3L)
    r.getAs[Double]("top_2") shouldBe 1.0
    r.getAs[Long]("r_top_2") shouldBe 0L
  }

  test("top-family count ties score the candidate with the larger union coverage") {
    // every 2-gram of "aa b cc dd" occurs once — all tie at count 1, so
    // the score is the LONGEST single gram span:
    // "aa b"(4), "b cc"(4), "cc dd"(5) → 5 over joined length 10
    val r = card((4L, "aa b cc dd"))(4L)
    r.getAs[Double]("top_2") shouldBe (5.0 / 10.0)
  }

  test("short and punctuation-only docs get a zero-fraction passing row; m93 has no row for them") {
    val out = card((5L, "solo"), (6L, "..."))
    out(5L).getAs[Double]("top_2") shouldBe 0.0
    out(5L).getAs[Long]("pass") shouldBe 1L
    out(6L).getAs[Long]("pass") shouldBe 1L
    massCard((5L, "solo"), (6L, "...")).keySet shouldBe Set.empty
  }

  test("clean prose passes; a spam-repetition page fails the dup gates") {
    val spam = Array.fill(4)("limited time offer click here to claim your reward now").mkString(" ")
    // 30 distinct tokens: no repeated grams at any n, and long enough
    // that the longest single 2/3/4-gram clears the top thresholds
    val out = card((7L, "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four"),
      (8L, spam))
    out(7L).getAs[Long]("pass") shouldBe 1L
    out(8L).getAs[Long]("pass") shouldBe 0L
    out(8L).getAs[Long]("r_dup_10") shouldBe 0L
  }
}
