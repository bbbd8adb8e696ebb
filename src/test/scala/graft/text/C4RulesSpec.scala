package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private val fiveSentences =
    "alpha runs here. beta waits there. gamma looks up. delta sits down. epsilon ends it."

  private def card(rows: (Long, String)*) =
    C4Rules.c4Rules(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getValuesMap[Any](Seq("n_lines",
        "n_kept_lines", "n_sentences", "has_lorem", "has_brace",
        "has_badword", "r_min_sentences", "pass", "text_clean")))
      .toMap

  test("line filter: terminal punctuation, min words, javascript") {
    val out = card(
      1L -> (fiveSentences + "\nno terminal punctuation here\nok fine." +
        "\nplease enable javascript to view this page."))
    val c = out(1L)
    c("n_lines") shouldBe 4L
    // only the five-sentence line survives: line 2 lacks punctuation,
    // line 3 has 2 words, line 4 mentions javascript
    c("n_kept_lines") shouldBe 1L
    c("text_clean") shouldBe fiveSentences
    c("n_sentences") shouldBe 5L
    c("pass") shouldBe 1L
  }

  test("page flags: lorem ipsum, curly brace, blocklist each sink the page") {
    val out = card(
      1L -> fiveSentences,
      2L -> (fiveSentences + "\nlorem ipsum dolor sit amet."),
      3L -> (fiveSentences + "\nconst config = { theme: dark }"),
      4L -> (fiveSentences + "\nwin big at the casino tonight."))
    out(1L)("pass") shouldBe 1L
    out(2L)("has_lorem") shouldBe 1L
    out(2L)("pass") shouldBe 0L
    out(3L)("has_brace") shouldBe 1L
    out(3L)("pass") shouldBe 0L
    out(4L)("has_badword") shouldBe 1L
    out(4L)("pass") shouldBe 0L
  }

  test("sentence floor counts kept text only — a struck line's period is invisible") {
    val out = card(
      // four sentences kept + a javascript line whose period must NOT
      // push the count to five
      1L -> ("alpha runs here. beta waits there. gamma looks up. delta sits down." +
        "\nplease enable javascript to view this page."))
    out(1L)("n_sentences") shouldBe 4L
    out(1L)("r_min_sentences") shouldBe 0L
    out(1L)("pass") shouldBe 0L
  }

  test("a page with zero kept lines fails even with clean flags") {
    val out = card(1L -> "no punctuation anywhere\nstill none here")
    out(1L)("n_kept_lines") shouldBe 0L
    out(1L)("text_clean") shouldBe ""
    out(1L)("pass") shouldBe 0L
  }

  test("the synthetic noise corpus exercises both branches of every rule") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
    val out = graft.queries.CorpusQueries.c4Rules(spark, dir).cache()
    try {
      out.count() shouldBe docs.filter(col("text").isNotNull).count()
      for (c <- Seq("has_lorem", "has_brace", "has_badword",
        "r_min_sentences", "pass")) {
        withClue(s"rule column $c must fire both ways on the fixture: ") {
          out.select(countDistinct(col(c))).head.getLong(0) shouldBe 2L
        }
      }
      // the line filter must both keep and strike on every doc: the base
      // boilerplate never ends in punctuation, so kept < total always,
      // and evens keep at least the five-sentence line
      out.filter(col("n_kept_lines") === col("n_lines")).count() shouldBe 0L
      out.filter(col("n_kept_lines") > 0L).count() should be > 0L
    } finally out.unpersist()
  }
}
