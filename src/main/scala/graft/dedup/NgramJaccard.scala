package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram Jaccard similarity — the classic fuzzy-dedup verifier
  * for short texts where word shingles are too coarse.
  *
  * Pair generation is delegated (use MinHashLSH/SimHash candidates — never
  * all-pairs at scale); this module scores given pairs with codegen'd array
  * expressions only.
  */
object NgramJaccard {

  /** Distinct character n-grams of the lowercased text (Column form, used
    * by the specs; production scoring uses [[charNgramHashes]] — the
    * per-element substr lambda is interpreted and measured hot). */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val t = lower(text)
    array_distinct(
      transform(sequence(lit(0), greatest(length(t) - n, lit(0))),
        i => t.substr(i + lit(1), lit(n))))
  }

  /** Distinct n-gram hashes in one compiled pass per document — grams never
    * materialize as strings; Jaccard over hash sets is identical up to
    * 2^-64 collisions. */
  val charNgramHashes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, n: Int) =>
      if (text == null) Array.empty[Long]
      else {
        val t = text.toLowerCase
        val set = new java.util.HashSet[java.lang.Long]()
        if (t.length <= n) set.add(graft.functions.Fnv.chars(t))
        else {
          var i = 0
          while (i + n <= t.length) {
            set.add(graft.functions.Fnv.chars(t.subSequence(i, i + n)))
            i += 1
          }
        }
        val out = new Array[Long](set.size)
        val it = set.iterator()
        var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      }
    }

  /** Score (doc_a, doc_b) pairs with exact n-gram Jaccard by joining the
    * n-gram sets back on. Two hash joins on doc id; gram sets are built in
    * the projection, so only candidate documents pay the cost. */
  def scorePairs(docs: DataFrame, pairs: DataFrame, textCol: String = "text",
                 n: Int = 3): DataFrame = {
    val grams = docs.select(col("doc_id"), charNgramHashes(col(textCol), lit(n)).as("g"))
    pairs
      .join(grams.withColumnsRenamed(Map("doc_id" -> "doc_a", "g" -> "g_a")), Seq("doc_a"))
      .join(grams.withColumnsRenamed(Map("doc_id" -> "doc_b", "g" -> "g_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
  }

  /** End-to-end: LSH candidates → n-gram Jaccard ≥ threshold. */
  def nearDuplicates(docs: DataFrame, textCol: String = "text", n: Int = 3,
                     threshold: Double = 0.6): DataFrame =
    scorePairs(docs, MinHashLSH.candidatePairs(docs, textCol), textCol, n)
      .filter(col("jaccard") >= threshold)
}
