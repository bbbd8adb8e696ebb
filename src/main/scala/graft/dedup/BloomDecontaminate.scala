package graft.dedup

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered benchmark decontamination — [[Decontaminate]]'s exact
  * semantics (byte-identical output; the two share one oracle) with the
  * scale path for a benchmark side too large to broadcast as a hash
  * relation: a Bloom filter over the benchmark's gram hashes is ~10 bits
  * per gram instead of the ~40 bytes per entry a broadcast HashedRelation
  * costs, a ~30× smaller ship. The corpus gram stream probes the bitset
  * inside whole-stage codegen (Spark's own BloomFilterMightContain — the
  * expression its runtime row-filtering injects), and only the tiny
  * candidate fraction (true hits + fpp false positives) reaches the exact
  * verify join that removes the false positives.
  *
  * Scale shape (100 TB):
  *  - building the filter is one treeAggregate over the benchmark gram
  *    hashes — per-partition bitsets OR-merged up a tree, driver holds one;
  *  - n_grams per doc is computed map-side from the shingle-set size (no
  *    join, no shuffle of grams);
  *  - the bloom probe is a codegen'd filter on the gram stream; survivors
  *    are ~(hit_rate + fpp) of the corpus grams, so the verify join's
  *    stream side is small no matter how big the corpus is — AQE picks
  *    the join strategy (bench grams may themselves be too big to
  *    broadcast; a shuffled join over the tiny candidate stream is fine);
  *  - the per-doc hit aggregation collapses map-side as usual.
  *
  * The gram walk is [[NgramJaccard.wordShingleHashSet]] — the same shared
  * walk as m25, so the m25 DuckDB oracle replays this operator verbatim.
  */
object BloomDecontaminate {

  /** Serialized Bloom filter over the distinct benchmark gram hashes.
    * Built distributed (treeAggregate), returned as the writeTo() bytes
    * that [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * deserializes. */
  private[dedup] def benchmarkBloom(benchGrams: DataFrame, fpp: Double): Array[Byte] = {
    val spark = benchGrams.sparkSession
    import spark.implicits._
    val grams = benchGrams.select(col("gram")).as[Long]
    // expectedNumItems needs a count; the bench side is the small one by
    // contract, so this extra action is over grams-of-MBs, not the corpus.
    val n = math.max(grams.count(), 1L)
    val bf = grams.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      seqOp = (f, g) => { f.putLong(g); f },
      combOp = (a, b) => { a.mergeInPlace(b); a })
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Drop-in for [[Decontaminate.contaminated]]: corpus docs whose
    * distinct-gram hit ratio against the benchmark gram set reaches
    * `ratioThreshold` → (doc_id, n_hits, n_grams, hit_ratio). */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   textCol: String = "text", w: Int = 3,
                   ratioThreshold: Double = 0.5,
                   fpp: Double = 0.03): DataFrame = {
    val spark = corpus.sparkSession
    val shingles = NgramJaccard.wordShingleHashSet(col(textCol), lit(w))
    val benchGrams = benchmark.select(explode(shingles).as("gram")).distinct()
    val blob = benchmarkBloom(benchGrams, fpp)

    // Per-doc gram totals: map-side only — the set size IS n_grams.
    val totals = corpus
      .select(col("doc_id"), size(shingles).cast("long").as("n_grams"))
      .filter(col("n_grams") > 0)

    // Bloom-prefiltered candidates, then the exact verify join (left semi:
    // false positives vanish, and the join output carries nothing extra).
    val candidates = corpus
      .select(col("doc_id"), explode(shingles).as("gram"))
      .filter(GraftFunctions.bloomContains(spark, lit(blob), col("gram")))
    val hits = candidates
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))

    totals.join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_ratio", col("n_hits").cast("double") / col("n_grams"))
      .filter(col("hit_ratio") >= ratioThreshold)
      .select("doc_id", "n_hits", "n_grams", "hit_ratio")
  }
}
