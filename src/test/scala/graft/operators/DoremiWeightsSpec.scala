package graft.operators

import graft.SparkSpec

class DoremiWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("single domain: excess is 0 and the smoothed weight is exactly 1") {
    val docs = Seq((1L, "the cat sat", "en"), (2L, "the dog sat", "en"))
      .toDF("doc_id", "text", "lang")
    val out = DoremiWeights.weights(docs).collect()
    out.length shouldBe 1
    out.head.getDouble(4) shouldBe 0.0 // ce == pooled ce
    out.head.getDouble(5) shouldBe 1.0 // 0.99·(1/1) + 0.01/1
  }

  test("two identical-distribution domains split the budget evenly") {
    val docs = Seq((1L, "a b c d", "x"), (2L, "a b c d", "y"))
      .toDF("doc_id", "text", "lang")
    val w = DoremiWeights.weights(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    w("x") shouldBe 0.5
    w("y") shouldBe 0.5
  }

  test("the worse-fit domain is up-weighted; the better-fit one's excess clips to 0") {
    // 'good' repeats the corpus-dominant bigrams; 'rare' is all singleton
    // bigrams the pooled LM fits badly
    val docs = Seq(
      (1L, "the cat sat on the mat", "good"),
      (2L, "the cat sat on the mat", "good"),
      (3L, "the cat sat on the mat", "good"),
      (4L, "zq wv xj kp qz vw jx", "rare")).toDF("doc_id", "text", "lang")
    val rows = DoremiWeights.weights(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    rows("rare").getDouble(4) should be > 0.0 // positive excess
    rows("good").getDouble(4) shouldBe 0.0 // below-average fit clips
    rows("rare").getDouble(5) should be > rows("good").getDouble(5)
    // weights sum to ~1 (smoothing preserves the simplex)
    (rows("rare").getDouble(5) + rows("good").getDouble(5)) shouldBe 1.0 +- 1e-12
  }

  test("bigram-free docs carry no loss: a domain of 1-token docs is absent") {
    val docs = Seq((1L, "hello world again", "en"), (2L, "solo", "zz"))
      .toDF("doc_id", "text", "lang")
    val out = DoremiWeights.weights(docs).collect()
    out.map(_.getString(0)).toSet shouldBe Set("en")
  }
}
