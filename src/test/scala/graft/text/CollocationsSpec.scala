package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi matches the hand formula on a tiny corpus") {
    // "a b" x3 and "c d" x2, plus filler singles. minCount=2 keeps both.
    val docs = Seq(
      (0L, "a b a b a b"),
      (1L, "c d c d"),
      (2L, "e")
    ).toDF("doc_id", "text")
    val out = Collocations.pmiBigrams(docs, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // Bigram mass N: doc0 has 5, doc1 has 3, doc2 has 0 -> 8.
    val n = 8.0
    // a b: c_xy=3, c_a=3, c_b=3.
    val (cab, ca, cb, pmiAb) = out(("a", "b"))
    cab shouldBe 3L; ca shouldBe 3L; cb shouldBe 3L
    pmiAb shouldBe math.log(3.0 * n / (3.0 * 3.0)) +- 1e-12
    // c d: c_xy=2, c_c=2, c_d=2 -> ln(2*8/4) = ln 4.
    out(("c", "d"))._4 shouldBe math.log(4.0) +- 1e-12
    // b a: c_xy=2 (interior pairs) also survives minCount=2.
    out(("b", "a"))._1 shouldBe 2L
    // d c appears once -> pruned by minCount.
    out.contains(("d", "c")) shouldBe false
  }

  test("minCount prunes and marginals count every token occurrence") {
    val docs = Seq((0L, "x y z"), (1L, "x y")).toDF("doc_id", "text")
    val rows = Collocations.pmiBigrams(docs, minCount = 2L).collect()
    rows.length shouldBe 1
    val r = rows(0)
    (r.getString(0), r.getString(1)) shouldBe ("x", "y")
    r.getLong(2) shouldBe 2L  // c_xy
    r.getLong(3) shouldBe 2L  // c_x counts both x tokens
    r.getLong(4) shouldBe 2L  // c_y counts both y tokens
  }

  test("runs on sf0.001 documents; frequent pairs get lower pmi than rare ones with equal marginals") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = Collocations.pmiBigrams(docs, minCount = 5L)
    out.count() should be > 0L
    // Every pmi is finite (counts are all >= 1, N >= c_xy).
    out.filter(col("pmi").isNull).count() shouldBe 0L
  }
}
