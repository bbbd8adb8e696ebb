package graft.text

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // Corpus: 3 docs. "cat" only in doc 1 (df=1), "the" in all (df=3).
  private val corpus = docs(
    (1L, "the cat cat sat"),
    (2L, "the dog sat"),
    (3L, "the bird"))

  test("scores match the hand-computed tf*ln((N+1)/(df+1))") {
    val out = TfIdf.topTerms(corpus, k = 10)
      .collect().map(r => ((r.getLong(0), r.getString(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    // doc1 "cat": tf=2, df=1, N=3 → 2*ln(4/2)
    out((1L, "cat")) shouldBe ((2L, 2 * math.log(2.0)))
    // doc1 "the": tf=1, df=3 → ln(4/4)=0
    out((1L, "the"))._2 shouldBe 0.0 +- 1e-15
    // doc2 "dog": tf=1, df=1 → ln(2)
    out((2L, "dog"))._2 shouldBe math.log(2.0) +- 1e-15
  }

  test("rank orders by score desc then term asc, truncated at k") {
    val rows = TfIdf.topTerms(corpus, k = 2)
      .filter($"doc_id" === 1L).orderBy("rank")
      .select("term").as[String].collect()
    // doc1 scores: cat 2ln2, sat ln2 (df=2→ln(4/3)? no: sat df=2 → ln(4/3)),
    // the 0. Top-2 = cat, then sat.
    rows shouldBe Array("cat", "sat")
    TfIdf.topTerms(corpus, k = 2).groupBy("doc_id").count()
      .select("count").as[Long].collect().foreach(_ should be <= 2L)
  }

  test("equal scores break ties on term alphabetically") {
    // both terms: tf=1, df=1 → identical scores
    val out = TfIdf.topTerms(docs((1L, "zeta alpha")), k = 2)
      .orderBy("rank").select("term").as[String].collect()
    out shouldBe Array("alpha", "zeta")
  }

  test("null/empty docs are absent; N counts only docs with tokens") {
    val mixed = Seq((1L, Option("only doc")), (2L, Option.empty[String]),
      (3L, Option("   "))).toDF("doc_id", "text")
    val out = TfIdf.topTerms(mixed, k = 5).collect()
    out.map(_.getLong(0)).distinct shouldBe Array(1L)
    // N=1: score = tf * ln(2/2) = 0 for df=1 terms
    out.foreach(_.getDouble(4) shouldBe 0.0 +- 1e-15)
  }

  test("the df lookup is broadcast; no sort-merge join in the plan") {
    val plan = TfIdf.topTerms(corpus, k = 3)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("one tokenize pass: the df branch reuses the tf shuffle at runtime") {
    // The df aggregate must keep a genuine dependency on the tf column
    // (sum(least(tf,1))): with count(1) the optimizer prunes the subtree
    // to a distinct, the exchanges stop canonicalizing equal, and the
    // corpus is re-scanned and re-exploded. Reuse only shows in the
    // POST-execution adaptive plan.
    val q = TfIdf.topTerms(corpus, k = 3)
    q.collect()
    q.queryExecution.executedPlan.toString should include("ReusedExchange")
  }
}
