package graft.text

import graft.SparkSpec

/** The compiled per-doc repetition card must be BIT-identical to the
  * distributed Column-form reference — the repo-wide fast-path contract
  * (same discipline as profile ≡ column forms): if the two ever diverge,
  * the m93 oracle (which replays the reference semantics in SQL) would
  * silently certify the wrong engine path. */
class RepetitionDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    (TextOps.repetitionRulesCompiled(df), TextOps.repetitionRules(df))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("compiled ≡ distributed on a mixed corpus: spam, prose, overlap, edge docs") {
    val docs = Seq(
      0L -> "a b a b a b",
      1L -> "x a a a y z w q",
      2L -> "a a a a a a b c d",
      3L -> Array.fill(4)("limited time offer click here now").mkString(" "),
      4L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
      5L -> "solo",                       // < 2 tokens: NO row in either
      6L -> "",                           // empty: no row
      7L -> null.asInstanceOf[String],    // null: filtered
      8L -> "a a a a a a a a a a a a a",  // fully periodic, caps at 1.0
      9L -> ("one two three four five six seven eight nine ten " * 3).trim
    )
    val (fast, ref) = both(docs: _*)
    fast.columns.toSeq shouldBe ref.columns.toSeq
    canon(fast) shouldBe canon(ref)
    // row policy: docs 5/6/7 absent from both
    fast.select("doc_id").as[Long].collect().toSet shouldBe
      Set(0L, 1L, 2L, 3L, 4L, 8L, 9L)
  }

  test("compiled ≡ distributed on the cap boundary: mass exceeding text length clips to 1.0") {
    val (fast, ref) = both(10L -> "a a a a a a")
    canon(fast) shouldBe canon(ref)
    fast.collect().head.getAs[Double]("top_2") shouldBe 1.0
  }
}
