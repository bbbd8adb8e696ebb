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
      (5L, "serial 12345678901234567890123456 x"),  // 26 digits — over 19, rejected
      (6L, "")                                      // empty text → zero counts
    ).toDF("doc_id", "text")
    val out = Luhn.cardCounts(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array(
      (1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 0L),
      (4L, 2L, 2L), (5L, 0L, 0L), (6L, 0L, 0L))
  }

  test("null text is excluded; separators do not affect the checksum") {
    val docs = Seq((1L, null.asInstanceOf[String]),
      (2L, "x 4111-1111 1111-1111 y")).toDF("doc_id", "text")
    val out = Luhn.cardCounts(docs).as[(Long, Long, Long)].collect()
    out shouldBe Array((2L, 1L, 1L))
  }
}
