package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document character-distribution Shannon entropy (m76) — the
  * model-free information-density dial next to [[CompressionRatio]]'s
  * deflate proxy: binary-ish junk and mojibake sit HIGH, repeated-char
  * spam sits LOW, natural prose in a stable band (~4.1 bits ≈ 2.8 nats
  * for English). Unlike deflate it is exactly SQL-replayable, so this
  * one carries a hash oracle.
  *
  * One compiled pass per row (the [[TextOps.profile]] UDF pattern):
  * counts in a per-call map, entropy folded in ascending char order so
  * the float summation is deterministic within the engine. Chars are
  * UTF-16 code units — identical to per-character for the BMP text this
  * corpus ships; a surrogate-aware variant would walk code points.
  *
  * Scale shape (100 TB): a pure projection — no shuffle, no explode
  * (the relational explode-per-character form the ORACLE uses would be
  * one row per char; the engine keeps the walk inside the row).
  */
object CharEntropy {

  private val entropyUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) None
    else {
      val counts = new java.util.TreeMap[Char, Long]()
      var i = 0
      while (i < text.length) {
        counts.merge(text.charAt(i), 1L, (a, b) => a + b)
        i += 1
      }
      val n = text.length.toDouble
      var ent = 0.0
      counts.forEach { (_, c) =>
        val p = c / n
        ent -= p * math.log(p)
      }
      Some((text.length.toLong, counts.size.toLong, ent))
    }
  }

  /** (doc_id, n_chars_counted, char_types, char_entropy) for non-empty
    * documents; entropy in nats over the character distribution. */
  def entropy(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col("doc_id"), entropyUdf(col(textCol)).as("e"))
      .select(col("doc_id"),
        col("e._1").as("n_chars_counted"),
        col("e._2").as("char_types"),
        col("e._3").as("char_entropy"))
}
