package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("counts corpus bigrams and flags rare ones") {
    // "a b" occurs 3× (docs 1,2,3); "b c" occurs 1× (doc 3 only).
    val df = docs((1L, "a b"), (2L, "a b"), (3L, "a b c"))
    val out = NgramNovelty.bigramNovelty(df, rareMax = 1)
      .orderBy("doc_id").collect()
    out(0).getAs[Long]("n_bigrams") shouldBe 1
    out(0).getAs[Long]("n_rare") shouldBe 0 // "a b" count 3 > 1
    out(2).getAs[Long]("n_bigrams") shouldBe 2
    out(2).getAs[Long]("n_rare") shouldBe 1 // "b c" count 1
    out(2).getAs[Double]("rare_rate") shouldBe 0.5
    // mean_log_freq = (ln 3 + ln 1) / 2
    out(2).getAs[Double]("mean_log_freq") shouldBe
      ((math.log(3) + math.log(1)) / 2) +- 1e-12
  }

  test("docs with fewer than two tokens are absent") {
    val df = docs((1L, "solo"), (2L, ""), (3L, "a b"))
    val out = NgramNovelty.bigramNovelty(df, rareMax = 1)
    out.select("doc_id").as[Long].collect() shouldBe Array(3L)
  }

  test("null text rows are excluded") {
    val df = Seq((1L, Option.empty[String]), (2L, Option("x y")))
      .toDF("doc_id", "text")
    NgramNovelty.bigramNovelty(df, rareMax = 1).count() shouldBe 1
  }

  test("tokenization matches the corpus standard (lower, trim, multi-space)") {
    val out = NgramNovelty.bigramNovelty(docs((1L, "  A   b ")), rareMax = 9)
      .collect()(0)
    out.getAs[Long]("n_bigrams") shouldBe 1 // gram "a b", rare
    out.getAs[Long]("n_rare") shouldBe 1
  }
}
