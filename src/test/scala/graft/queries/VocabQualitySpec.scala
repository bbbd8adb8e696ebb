package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabQualitySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat cat cat dog"),   // cat tf=3, dog tf=2
    (2L, "dog zebra"),         // zebra tf=1 → OOV at vocabSize=2
    (3L, "cat")
  ).toDF("doc_id", "text")

  test("OOV counts and mean log-frequency against a top-V vocab") {
    val r = CorpusQueries.vocabQualityOver(corpus, vocabSize = 2)
      .orderBy("doc_id").collect()
    // vocab = {cat (tf 4), dog (tf 2)}; zebra is OOV
    r(0).getAs[Long]("n_oov") shouldBe 0
    r(0).getAs[Double]("oov_rate") shouldBe 0.0
    r(1).getAs[Long]("n_tokens") shouldBe 2
    r(1).getAs[Long]("n_oov") shouldBe 1
    r(1).getAs[Double]("oov_rate") shouldBe 0.5
    // doc 2 in-vocab tokens: dog only → mean_log_tf = ln(2)
    r(1).getAs[Double]("mean_log_tf") shouldBe math.log(2.0) +- 1e-12
    r(2).getAs[Double]("mean_log_tf") shouldBe math.log(4.0) +- 1e-12
  }

  test("vocab lookup is a broadcast join (token stream never shuffles for it)") {
    val plan = CorpusQueries.vocabQualityOver(corpus, vocabSize = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("all-OOV doc yields null mean_log_tf, rate 1.0") {
    val d = Seq((1L, "aa aa aa"), (2L, "zz")).toDF("doc_id", "text")
    val r = CorpusQueries.vocabQualityOver(d, vocabSize = 1)
      .orderBy("doc_id").collect()
    r(1).getAs[Double]("oov_rate") shouldBe 1.0
    r(1).isNullAt(r(1).fieldIndex("mean_log_tf")) shouldBe true
  }
}
