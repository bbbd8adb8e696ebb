package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SystematicSampleSpec extends SparkSpec {
  import spark.implicits._

  test("uniform weights with k | n select exactly k distinct docs, one hit each") {
    val docs = (0L until 100L).map(i => (i, 10L)).toDF("doc_id", "n_tokens")
    val out = SystematicSample.sample(docs, "doc_id", "n_tokens", k = 20).collect()
    out.length shouldBe 20
    out.foreach(_.getLong(3) shouldBe 1L)
  }

  test("total hits always equal k and heavy docs repeat proportionally") {
    // One doc carries 90% of the mass.
    val docs = ((0L until 9L).map(i => (i, 10L)) :+ (99L, 810L))
      .toDF("doc_id", "n_tokens")
    val out = SystematicSample.sample(docs, "doc_id", "n_tokens", k = 30).collect()
    out.map(_.getLong(3)).sum shouldBe 30L
    val heavy = out.find(_.getLong(0) == 99L).get.getLong(3)
    // 90% of 30 midpoints, ±1 for alignment.
    heavy should (be >= 26L and be <= 28L)
  }

  test("deterministic across runs and zero-weight docs are never selected") {
    val docs = (0L until 50L).map(i => (i, if (i % 7 == 0) 0L else i)).toDF("doc_id", "n_tokens")
    val a = SystematicSample.sample(docs, "doc_id", "n_tokens", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    val b = SystematicSample.sample(docs, "doc_id", "n_tokens", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    a shouldBe b
    a.map(_._2).sum shouldBe 10L
    val zeroIds = (0L until 50L).filter(_ % 7 == 0).toSet
    a.map(_._1).toSet.intersect(zeroIds) shouldBe Set.empty
  }
}
