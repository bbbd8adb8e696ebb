package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def valid(ds: String): Boolean =
    Seq(ds).toDF("d").select(Luhn.isLuhnValid(col("d"))).as[Boolean].head()

  test("Luhn checksum on the known test vectors") {
    valid("4111111111111111") shouldBe true   // the canonical Visa test PAN
    valid("4111111111111112") shouldBe false  // last digit bumped
    valid("79927398713") shouldBe true        // the textbook Luhn example
    valid("79927398714") shouldBe false
    valid("5500005555555559") shouldBe true   // MC test PAN
  }

  test("cardCounts: valid, checksum-invalid and length-negative docs") {
    val docs = Seq(
      (1L, "pay 4111 1111 1111 1111 today"),        // valid, spaced
      (2L, "ref 4111-1111-1111-1112 attached"),     // candidate, Luhn-invalid
      (3L, "order 123456 confirmed"),               // below candidate length
      (4L, "two: 4111 1111 1111 1111 and 5500 0055 5555 5559"), // both valid
      // 26 unbroken digits: a candidate run, but a single block offers
      // no 13–19-digit aligned window → rejected (the precision guard)
      (5L, "serial 12345678901234567890123456 x"),
      (6L, "")                                      // empty text → zero counts
    ).toDF("doc_id", "text")
    val out = Luhn.cardCounts(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array(
      (1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 0L),
      (4L, 2L, 2L), (5L, 1L, 0L), (6L, 0L, 0L))
  }

  test("adjacent digit context no longer masks a card (block-aligned windows)") {
    val docs = Seq(
      // a real PAN followed by an amount in the SAME run — the review
      // r16 scenario: the 4-block prefix is a valid 16-digit window
      (1L, "pay 4111 1111 1111 1111 123 dollars"),
      // two PANs back-to-back in one 39-char run: the run carries card
      // evidence (counted ONCE — n_cc_valid counts runs, not cards)
      (2L, "4111 1111 1111 1111 5500 0055 5555 5559"),
      // digits prepended: the PAN is blocks 2..5
      (3L, "id 77 4111 1111 1111 1111 end"),
      // a 17-digit UNBROKEN run embedding a valid 16-digit prefix: no
      // separator boundary → no aligned window → conservatively clean
      (4L, "n 41111111111111111 x")
    ).toDF("doc_id", "text")
    val out = Luhn.cardCounts(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 0L))
  }

  test("null text is excluded; separators do not affect the checksum") {
    val docs = Seq((1L, null.asInstanceOf[String]),
      (2L, "x 4111-1111 1111-1111 y")).toDF("doc_id", "text")
    val out = Luhn.cardCounts(docs).as[(Long, Long, Long)].collect()
    out shouldBe Array((2L, 1L, 1L))
  }
}
