package graft.similarity

import graft.SparkSpec

class RrfFusionSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "rank", "doc_id")

  private def c(rank: Long): Long = 1000000000L / (60L + rank)

  test("doc in both lists outranks docs in one; exact integer scores") {
    val a = list((1L, 1L, 10L), (1L, 2L, 20L))
    val b = list((1L, 1L, 20L), (1L, 2L, 30L))
    val out = RrfFusion.fuse(a, b, k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("rrf_q9"))).toMap
    out(20L) shouldBe (1L, c(2) + c(1)) // in both
    out(10L) shouldBe (2L, c(1))        // A rank 1 beats B rank 2 alone
    out(30L) shouldBe (3L, c(2))
  }

  test("absent-list ranks surface as nulls, contribute zero") {
    val a = list((1L, 1L, 10L))
    val b = list((1L, 1L, 20L))
    val rows = RrfFusion.fuse(a, b, k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows(10L).isNullAt(rows(10L).fieldIndex("rank_b")) shouldBe true
    rows(20L).isNullAt(rows(20L).fieldIndex("rank_a")) shouldBe true
    rows(10L).getAs[Long]("rrf_q9") shouldBe c(1)
  }

  test("score ties break on doc_id ascending") {
    val a = list((1L, 1L, 50L))
    val b = list((1L, 1L, 40L)) // same contribution c(1) for both docs
    val out = RrfFusion.fuse(a, b, k = 10).collect()
      .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("doc_id")).toMap
    out(1L) shouldBe 40L
    out(2L) shouldBe 50L
  }

  test("k caps per query, queries fuse independently") {
    val a = list((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (2L, 1L, 7L))
    val b = list((2L, 1L, 8L))
    val out = RrfFusion.fuse(a, b, k = 2).collect()
    out.count(_.getAs[Long]("query_id") == 1L) shouldBe 2
    out.count(_.getAs[Long]("query_id") == 2L) shouldBe 2
  }
}
