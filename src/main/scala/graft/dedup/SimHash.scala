package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit locality-sensitive fingerprint
  * per document; near-dups are pairs within a small Hamming distance.
  *
  * The signature is one compact Scala UDF (per-row, no state); candidate
  * generation is native: the 64-bit simhash is split into 4 16-bit chunks,
  * and by pigeonhole any pair with Hamming distance ≤ 3 agrees on at least
  * one chunk — so an equi-join per chunk finds all such pairs without a
  * cross join. Hamming verification is codegen'd `bit_count(a XOR b)`.
  *
  * Scale: one shuffle on (chunk_idx, chunk_value) — uniform 16-bit keys —
  * carrying only doc_ids; the 64-bit signatures rejoin by doc_id for the
  * Hamming verify. `bucketCap` drops pathological chunk buckets (e.g. all
  * null/empty texts hash to simhash 0 and would otherwise self-join
  * quadratically) without ever materializing them (capped aggregation
  * buffer), the same recall trade [[MinHashLSH.candidatePairs]] makes.
  */
object SimHash {

  /** 64-bit simhash over whitespace tokens (term-frequency weighted). */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      if (text == null) 0L
      else {
        val acc = new Array[Int](64)
        text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).foreach { tok =>
          // Deterministic 64-bit token hash (char-variant FNV-1a).
          val h = graft.functions.Fnv.chars(tok)
          var b = 0
          while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
        sig
      }
    }

  def signatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), simhash64(col(textCol)).as("simhash"))

  private def chunk(sim: Column, idx: Int): Column =
    shiftrightunsigned(sim, idx * 16).bitwiseAND(lit(0xFFFFL))

  /** Pairs (doc_a < doc_b) with Hamming distance ≤ maxDist (≤ 3 for full
    * recall with 4 chunks; larger maxDist trades recall as usual).
    * Buckets larger than `bucketCap` are dropped (recall trade, see class
    * doc), and the cap also bounds the aggregation BUFFER: only doc_ids
    * are collected (cappedIds stops at cap+1), so the all-empty-texts
    * bucket at chunk value 0 never materializes. The 64-bit signatures
    * rejoin by doc_id for the Hamming verify — only candidate docs pay
    * that join. */
  def nearDuplicates(docs: DataFrame, textCol: String = "text",
                     maxDist: Int = 3, bucketCap: Int = 1000): DataFrame = {
    // Three consumers (the chunk pass + both verify joins) — checkpoint
    // the 16 B/doc signature table once instead of re-running the
    // per-token UDF over the corpus per consumer.
    val sigs = signatures(docs, textCol).localCheckpoint(false)
    val chunked = sigs.select(
      col("doc_id"),
      posexplode(array((0 until 4).map(i => chunk(col("simhash"), i)): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val capped = chunked
      .groupBy("chunk_idx", "chunk_val")
      .agg(graft.functions.CappedCollect.cappedIds(bucketCap)(col("doc_id")).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    val pairs = capped
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    pairs
      .join(sigs.withColumnsRenamed(Map("doc_id" -> "doc_a", "simhash" -> "sim_a")), Seq("doc_a"))
      .join(sigs.withColumnsRenamed(Map("doc_id" -> "doc_b", "simhash" -> "sim_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
