package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source overlap matrix (m60): for every pair of sources, how much
  * of their distinct word-shingle mass is shared — the corpus-level dial
  * that exposes mirror sites, syndicated feeds, and one crawl ingested
  * twice under two names. Document-level dedup ([[MinHashLSH]], m17's
  * clusters) answers "which docs collide"; this answers "which SOURCES
  * are secretly the same corpus", which is what you read before deciding
  * whether a whole source should be dropped or down-weighted in the mix.
  *
  * Shingles are [[NgramJaccard.forEachWordShingle]]'s walk (the ONE
  * shared tokenization, hashed 64-bit FNV) — identical counts to the
  * oracle's string-shingle replay up to 2^-64 collisions, the m14/m25
  * argument.
  *
  * Scale shape (100 TB):
  *  - per-source distinct gram sets come from one map-side shingle walk
  *    + a (source, gram) distinct — the only corpus-sized exchange, and
  *    it carries 8-byte hashes, never text;
  *  - the pair counts are a self-equi-join ON GRAM (co-partitioned by the
  *    same exchange — no broadcast of anything corpus-sized); a gram seen
  *    by k sources yields C(k,2) ≤ C(n_sources,2) pairs, so the join
  *    output is bounded by sources², not documents²;
  *  - the per-source totals table is source-sized and BROADCAST into the
  *    final enrich joins.
  */
object SourceOverlap {

  /** (source_a, source_b, grams_a, grams_b, n_shared, jaccard) for every
    * source pair sharing ≥1 distinct w-token shingle; source_a < source_b.
    * jaccard = |A∩B| / |A∪B| over the distinct-shingle sets. */
  def overlapMatrix(docs: DataFrame, w: Int = 3,
                    textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col("source"),
        explode(NgramJaccard.wordShingleHashSet(col(textCol), lit(w))).as("gram"))
      .distinct()
    val counts = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(counts.select(col("source").as("source_a"),
        col("n").as("grams_a"))), Seq("source_a"))
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("grams_b"))), Seq("source_b"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("grams_a") + col("grams_b") - col("n_shared")).cast("double"))
      .select("source_a", "source_b", "grams_a", "grams_b", "n_shared", "jaccard")
  }
}
