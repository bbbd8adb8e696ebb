package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkupStripSpec extends SparkSpec {
  import spark.implicits._

  private def stripOf(s: String): String =
    Seq((1L, s)).toDF("doc_id", "text")
      .select(MarkupStrip.extractText(col("text")).as("t"))
      .as[String].collect()(0)

  test("script, style, and comment blocks vanish wholesale, content survives") {
    stripOf("<p>keep</p><script>var drop = 1;</script><p>this</p>") shouldBe "keep this"
    stripOf("<style>body { color: red; }</style>text") shouldBe "text"
    stripOf("a<!-- not content -->b") shouldBe "a b"
    // multi-line block bodies ((?s) dotall)
    stripOf("x<script type=\"a\">\nline1();\nline2();\n</script>y") shouldBe "x y"
  }

  test("tags are word boundaries, not deletions") {
    // a</p><p>b must not fuse into "ab"
    stripOf("<p>a</p><p>b</p>") shouldBe "a b"
    stripOf("<h1>title</h1>body") shouldBe "title body"
  }

  test("named entities decode exactly once — &amp;lt; comes out &lt;, not <") {
    stripOf("Tom &amp; Jerry") shouldBe "Tom & Jerry"
    stripOf("&lt;tag&gt;") shouldBe "<tag>"
    stripOf("&quot;q&quot; &#39;s &nbsp;here") shouldBe "\"q\" 's here"
    // the double-decode trap: source text showing an escaped entity
    stripOf("literal &amp;lt; stays") shouldBe "literal &lt; stays"
  }

  test("whitespace runs collapse and the result is trimmed") {
    stripOf("  <p> a   b </p>  ") shouldBe "a b"
  }

  test("text without markup passes through modulo whitespace") {
    stripOf("plain old text") shouldBe "plain old text"
  }

  test("stripMarkup keeps ids, lengths, and null rows") {
    val rows = MarkupStrip.stripMarkup(
      Seq((1L, Option("<p>hi</p>")), (2L, Option.empty[String]))
        .toDF("doc_id", "text")).orderBy("doc_id").collect()
    rows(0).getString(1) shouldBe "hi"
    rows(0).getLong(2) shouldBe 9L
    rows(0).getLong(3) shouldBe 2L
    rows(1).isNullAt(1) shouldBe true
  }

  test("the m51 augmentation round-trips: body text survives extraction") {
    val docs = Seq((7L, "the quick brown fox")).toDF("doc_id", "text")
    val out = MarkupStrip.stripMarkup(
      graft.queries.CorpusQueries.withSyntheticMarkup(docs))
      .as[(Long, String, Long, Long)].collect()(0)
    out._2 should include("the quick brown fox")
    out._2 should include("Doc 7")
    out._2 should include("literal &lt; stays")
    (out._2 should not).include("track(id)")
    (out._2 should not).include("color: #000")
  }
}
