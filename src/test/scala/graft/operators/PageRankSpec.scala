package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  /** Tiny driver-side reference implementation of the same fixed-iteration
    * scheme, for exact comparison. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        d: Double = 0.85): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val nodes = edges.map(_._1).distinct
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contribs = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      // full node set each round: in-degree-0 nodes keep the floor
      r = nodes.map(v => v -> ((1.0 - d) / n + d * contribs.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("symmetric two-node graph stays uniform") {
    val ranks = PageRank.ranks(sym(1L -> 2L), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(1L) shouldBe 0.5 +- 1e-12
    ranks(2L) shouldBe 0.5 +- 1e-12
  }

  test("star center out-ranks leaves and matches the reference power iteration") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L)
    val edgesSym = edges ++ edges.map(p => (p._2, p._1))
    val got = PageRank.ranks(sym(edges: _*), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(edgesSym, 10)
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) => v shouldBe want(k) +- 1e-12 }
    got(1L) should be > got(2L)
    got(2L) shouldBe got(3L) +- 1e-12
  }

  test("rank mass is conserved on a symmetrized graph") {
    val ranks = PageRank.ranks(sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L),
      iterations = 10)
    val total = ranks.collect().map(_.getDouble(1)).sum
    total shouldBe 1.0 +- 1e-9
  }

  test("empty edge list returns an empty rank table, not a divide-by-zero") {
    // scale-revealed (sf1): a corpus where stop-gram pruning drops every
    // near-dup pair hands PageRank an empty graph.
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = PageRank.ranks(empty, iterations = 10)
    out.columns.toSeq shouldBe Seq("node", "rank")
    out.count() shouldBe 0L
  }

  test("directed graph: in-degree-0 node keeps the floor and mass is conserved") {
    // node 4 has out-edges only — before the full-node re-join it dropped
    // out of the rank table after round 1 and its mass leaked.
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L)
    val got = PageRank.ranks(edges.toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(edges, 10)
    got.keySet shouldBe want.keySet
    got.keySet should contain(4L)
    got.foreach { case (k, v) => v shouldBe want(k) +- 1e-12 }
    got(4L) shouldBe (1.0 - 0.85) / 4.0 +- 1e-12
    got.values.sum shouldBe 1.0 +- 1e-9
  }
}
