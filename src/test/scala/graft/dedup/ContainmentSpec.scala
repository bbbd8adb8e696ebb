package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row

/** m113 — asymmetric Broder containment: the subset-duplication case the
  * symmetric Jaccard tier is blind to. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, String)*): Map[(Long, Long), Row] =
    NgramJaccard.containmentPairs(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap

  test("a quote inside a long doc: containment 1.0 one way, symmetric jaccard blind") {
    val long = (1L, "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango")
    val quote = (2L, "alpha bravo charlie delta echo foxtrot")
    val out = pairs(long, quote)
    val r = out((1L, 2L))
    // quote: 6 tokens -> 4 shingles, all inside the long doc (18 shingles)
    r.getAs[Double]("containment_b") shouldBe 1.0
    r.getAs[Double]("containment_a") shouldBe (4.0 / 18.0)
    // symmetric jaccard = 4 / (18 + 4 - 4) = 0.22 — below any dedup
    // threshold: the m14 tier would never emit this pair
    NgramJaccard.invertedIndexPairs(
      Seq(long, quote).toDF("doc_id", "text"), threshold = 0.6)
      .count() shouldBe 0L
  }

  test("identical docs: containment 1.0 both ways; disjoint docs: no pair") {
    val out = pairs(
      (1L, "one two three four five"), (2L, "one two three four five"),
      (3L, "zeta eta theta iota kappa"))
    out.keySet shouldBe Set((1L, 2L))
    out((1L, 2L)).getAs[Double]("containment_a") shouldBe 1.0
    out((1L, 2L)).getAs[Double]("containment_b") shouldBe 1.0
  }

  test("threshold gates on the BEST direction: near-subset passes, weak overlap does not") {
    val out = pairs(
      (1L, "a b c d e f g h i j"),        // 8 shingles
      (2L, "a b c d e f g zz"),           // 6 shingles, 5 shared -> 5/6 = 0.83
      (3L, "a b c xx yy zz ww qq"))       // 6 shingles, 1 shared -> max 0.17
    out.keySet shouldBe Set((1L, 2L))
  }
}
