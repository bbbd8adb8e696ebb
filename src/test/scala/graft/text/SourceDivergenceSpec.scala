package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourceDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("a single source IS the corpus mixture: KL exactly 0") {
    val docs = Seq((1L, "a b b c"), (2L, "c a"))
      .toDF("doc_id", "text").withColumn("source", lit("only"))
    val out = SourceDivergence.klBySource(docs).collect()
    out.length shouldBe 1
    out.head.getDouble(3) shouldBe 0.0 // every term is p*log2(p/p) = 0
  }

  test("two disjoint-vocabulary sources: hand-computed 1 bit each") {
    // Corpus: x:2, y:2 (N=4). P_a(x)=1 vs Q(x)=1/2 -> KL_a = log2(2) = 1.
    val docs = Seq((1L, "x x", "a"), (2L, "y y", "b"))
      .toDF("doc_id", "text", "source")
    val out = SourceDivergence.klBySource(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    out("a") shouldBe 1.0
    out("b") shouldBe 1.0
  }

  test("tail bucket: tokens beyond the top-V aggregate, other_frac reports their mass") {
    // vocab = 1: the single most frequent token ("t", 4 occurrences,
    // tie-broken by count) is the vocabulary; everything else is tail.
    val docs = Seq((1L, "t t u v", "a"), (2L, "t t w w w", "b"))
      .toDF("doc_id", "text", "source")
    val out = SourceDivergence.klBySource(docs, vocab = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    out("a").getDouble(2) shouldBe 0.5 // u,v of 4 tokens
    out("b").getDouble(2) shouldBe 0.6 // w,w,w of 5 tokens
    // KL stays finite and positive: both sources differ from the mixture.
    out("a").getDouble(3) should be > 0.0
    out("b").getDouble(3) should be > 0.0
  }

  test("null-text docs are ignored and results are deterministic") {
    val docs = Seq((1L, "p q r", "a"), (2L, null, "a"), (3L, "p p", "b"))
      .toDF("doc_id", "text", "source")
    val run = () => SourceDivergence.klBySource(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val a = run()
    a shouldBe run()
    a.map(r => r._1 -> r._2).toMap shouldBe Map("a" -> 3L, "b" -> 2L)
  }
}
