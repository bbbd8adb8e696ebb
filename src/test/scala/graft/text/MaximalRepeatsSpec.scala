package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaximalRepeatsSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // the planted 60-token verbatim repeat (the round-14 verdict's test
  // case) inside two otherwise-unrelated documents
  private val repeat60 = words("rep", 60)
  private lazy val planted = Seq(
    (1L, words("alpha", 40) + " " + repeat60 + " " + words("omega", 25)),
    (2L, words("beta", 17) + " " + repeat60 + " " + words("gamma", 33)),
    (3L, words("lone", 80)) // no repeats: must not appear at all
  ).toDF("doc_id", "text")

  test("a 60-token verbatim repeat is recovered as ONE span of exactly 60 tokens") {
    val out = MaximalRepeats.spans(planted, w = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 2 // one maximal span per holding doc, nothing else
    // doc 1: repeat starts after 40 prefix tokens; doc 2: after 17
    out.toSet shouldBe Set((1L, 40L, 60L, 51L), (2L, 17L, 60L, 51L))
  }

  test("the fixed-window form only partially attributes what this recovers in full") {
    // w=30 window flags cover the repeat but as 31 overlapping window
    // rows per doc — never one span with its extent...
    val windowed = RepeatedWindows.flag(planted, w = 30)
      .filter(col("doc_id") === 1L).collect()
    windowed.length shouldBe 31
    // ...and a 15-token boilerplate is INVISIBLE to it entirely,
    val shortRep = words("boiler", 15)
    val docs = Seq(
      (10L, words("aa", 20) + " " + shortRep + " " + words("bb", 20)),
      (11L, words("cc", 31) + " " + shortRep + " " + words("dd", 12))
    ).toDF("doc_id", "text")
    RepeatedWindows.flag(docs, w = 30).count() shouldBe 0
    // while the unbounded tier reports it at its exact extent
    val spans = MaximalRepeats.spans(docs, w = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((10L, 20L, 15L), (11L, 31L, 15L))
  }

  test("two separate repeats in one document yield two spans (runs do not merge across gaps)") {
    val r1 = words("one", 12)
    val r2 = words("two", 14)
    val docs = Seq(
      (1L, r1 + " " + words("mid", 25) + " " + r2),
      (2L, r1 + " " + words("xyz", 40)),
      (3L, words("pqr", 33) + " " + r2)
    ).toDF("doc_id", "text")
    val spans = MaximalRepeats.spans(docs, w = 10)
      .filter(col("doc_id") === 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((0L, 12L), (37L, 14L))
  }

  test("documents shorter than w span their true token count, not w") {
    val docs = Seq(
      (1L, "tiny exact duplicate here"),
      (2L, "tiny exact duplicate here"),
      (3L, words("filler", 30))
    ).toDF("doc_id", "text")
    val spans = MaximalRepeats.spans(docs, w = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((1L, 0L, 4L), (2L, 0L, 4L))
  }

  test("minDocs raises the bar: a 2-doc repeat vanishes at minDocs = 3") {
    MaximalRepeats.spans(planted, w = 10, minDocs = 3).count() shouldBe 0
    // and guards reject degenerate parameters before any work
    an[IllegalArgumentException] should be thrownBy
      MaximalRepeats.spans(planted, w = 0)
    an[IllegalArgumentException] should be thrownBy
      MaximalRepeats.spans(planted, w = 10, minDocs = 1)
  }

  test("n_windows arithmetic: span_len − w + 1 for every regular span") {
    MaximalRepeats.spans(planted, w = 10).collect().foreach { r =>
      r.getLong(3) shouldBe r.getLong(2) - 10L + 1L
    }
  }
}
