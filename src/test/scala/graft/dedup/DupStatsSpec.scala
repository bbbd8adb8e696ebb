package graft.dedup

import graft.SparkSpec

class DupStatsSpec extends SparkSpec {
  import spark.implicits._

  // docs 0,1,2 are one family (canonical 0); 3,4 another (canonical 3);
  // 5 is a singleton; 6 has null text (0 tokens, singleton).
  private def docs = Seq(
    (0L, "a b c d", "web"),    // 4 tokens
    (1L, "a b c", "web"),      // 3
    (2L, "a b c e", "mirror"), // 4
    (3L, "x y", "web"),        // 2
    (4L, "x y z", "forum"),    // 3
    (5L, "solo doc here", "web"), // 3
    (6L, null.asInstanceOf[String], "web") // 0
  ).toDF("doc_id", "text", "source")

  private def clusters = Seq(
    (0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L)
  ).toDF("doc_id", "cluster_id")

  test("familyHistogram: sizes, doc counts, token mass and keep-one excess") {
    val out = DupStats.familyHistogram(docs, clusters).orderBy("family_size")
      .collect().map(r => r.getAs[Long]("family_size") ->
        (r.getAs[Long]("n_families"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("token_mass"), r.getAs[Long]("excess_token_mass"))).toMap
    out(1L) shouldBe (2L, 2L, 3L, 0L)  // docs 5 and 6; singletons have no excess
    out(2L) shouldBe (1L, 2L, 5L, 3L)  // family {3,4}: keep 3 (2 tok), cut 4 (3 tok)
    out(3L) shouldBe (1L, 3L, 11L, 7L) // family {0,1,2}: keep 0 (4), cut 1+2 (7)
  }

  test("sourceDupMass: dup and cross-source attribution per source") {
    val out = DupStats.sourceDupMass(docs, clusters).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_cross_source_dups"),
          r.getAs[Long]("cross_source_tokens"))).toMap
    // web: 5 docs; dup = doc 1 (canonical 0 also web → same-source)
    out("web") shouldBe (5L, 1L, 3L, 0L, 0L)
    // mirror: doc 2 duplicates web's doc 0 → cross-source
    out("mirror") shouldBe (1L, 1L, 4L, 1L, 4L)
    // forum: doc 4 duplicates web's doc 3 → cross-source
    out("forum") shouldBe (1L, 1L, 3L, 1L, 3L)
  }

  test("dup_doc_share is exact and zero for dup-free sources") {
    val out = DupStats.sourceDupMass(docs, clusters).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("dup_doc_share")).toMap
    out("web") shouldBe 0.2
    out("mirror") shouldBe 1.0
  }

  test("empty cluster map degrades every doc to a singleton family") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val hist = DupStats.familyHistogram(docs, empty).collect()
    hist should have length 1
    hist(0).getAs[Long]("family_size") shouldBe 1L
    hist(0).getAs[Long]("n_docs") shouldBe 7L
    hist(0).getAs[Long]("excess_token_mass") shouldBe 0L
  }
}
