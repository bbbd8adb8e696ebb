package graft.pipeline

import graft.SparkSpec
import graft.queries.CorpusQueries
import org.apache.spark.sql.functions.col

class DedupAssetsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("stored pair asset round-trips the direct m14 computation exactly") {
    val direct = CorpusQueries.gramIndexJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stored = DedupAssets.pairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    stored shouldBe direct
    stored should not be empty
  }

  test("stored cluster asset round-trips components over the pairs") {
    val direct = graft.dedup.DedupClusters.components(
        CorpusQueries.gramIndexJaccard(spark, dir).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = DedupAssets.clusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    stored shouldBe direct
    stored should not be empty
  }

  test("build runs once per key; later consumers read the stored copy") {
    var builds = 0
    def asset() = DedupAssets.materialized(
      spark, "spec-count", "k1", Seq("doc_id")) {
      builds += 1
      Seq((1L, 2L), (3L, 4L)).toDF("doc_id", "cluster_id")
    }
    asset().count() shouldBe 2
    asset().count() shouldBe 2
    asset().collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    builds shouldBe 1
  }

  test("an empty asset round-trips via the captured schema") {
    val out = DedupAssets.materialized(
      spark, "spec-empty", "k1", Seq("doc_a")) {
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    }
    out.columns.toSeq shouldBe Seq("doc_a", "doc_b")
    out.count() shouldBe 0
  }

  test("asset consumers match their pre-asset direct computations") {
    // m62/m66/m70 read the stored asset; their results must be what the
    // direct pair-graph rebuild produced (the round-7 hash-green shape).
    val pairs = CorpusQueries.gramIndexJaccard(spark, dir).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val directRanks = graft.operators.PageRank.ranks(edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val assetRanks = CorpusQueries.docPagerank(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assetRanks.keySet shouldBe directRanks.keySet
    assetRanks.foreach { case (k, v) => v shouldBe directRanks(k) +- 1e-9 }
  }
}
