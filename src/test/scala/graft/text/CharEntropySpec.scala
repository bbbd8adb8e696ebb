package graft.text

import graft.SparkSpec

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  test("entropy matches hand values: constant 0, uniform ln k") {
    val docs = Seq(
      (1L, "aaaaaaaa"),          // one symbol -> 0 nats
      (2L, "abcd"),              // 4 uniform symbols -> ln 4
      (3L, "aab"),               // p = (2/3, 1/3)
      (4L, ""),                  // excluded
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CharEntropy.entropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((8L, 1L, 0.0))
    out(2L)._3 shouldBe math.log(4.0) +- 1e-12
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    out(3L)._3 shouldBe -(p1 * math.log(p1) + p2 * math.log(p2)) +- 1e-12
  }

  test("the profile runs inside whole-stage codegen, not behind a UDF fence") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val p = CharEntropy.entropy(docs).queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators; the profile
    // projection must carry one (a UDF would split the pipeline).
    p should include("*(1) Project")
    p should include("graft_char_profile")
    (p should not).include("UDF")
  }

  test("spam sits below prose; corpus entropies live in a sane band") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val rows = CharEntropy.entropy(docs).collect()
    rows.length should be > 0
    val ents = rows.map(_.getDouble(3))
    all(ents.toSeq) should (be >= 0.0 and be <= math.log(256.0))
    // natural text over a ~30-char alphabet: comfortably above 2 nats
    (ents.sum / ents.length) should be > 2.0
  }
}
