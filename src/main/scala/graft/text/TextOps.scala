package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from `org.apache.spark.sql.functions` (codegen'd,
  * no UDFs): at 100 TB these run inside whole-stage codegen directly over
  * the parquet scan, so a quality-filter pass is scan-bound, not CPU-bound.
  * Regexes stick to explicit character classes that mean the same thing in
  * Java (Spark) and RE2 (DuckDB oracle).
  */
object TextOps {

  /** English stopword sample used for ratio features + language ID.
    * Deliberately small: the heuristic needs frequency mass, not coverage. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in",
    "is", "it", "that", "for", "on", "with", "as")

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), " +")

  /** Word-count via regex extraction — robust to punctuation and repeated
    * whitespace (unlike a bare split). */
  def wordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))).cast("long")

  /** BPE-ish token-count estimate: alpha runs, digit runs, and each other
    * non-space symbol count as one token — the standard cheap proxy for
    * subword tokenizer counts when the real tokenizer isn't on the cluster. */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Count of tokens that are in `Stopwords` (higher-order filter, no UDF). */
  def stopwordCount(text: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t))).cast("long")
  }

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("long")

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?'\"()-]"), lit(0))).cast("long")

  /** Composite quality score in [0,1]: length saturation + stopword mass +
    * digit/punct penalties. The exact weights matter less than the shape;
    * what matters operationally is that it is one codegen'd projection. */
  def qualityScore(text: Column): Column = {
    val nTok = wordCount(text).cast("double")
    val nChar = length(text).cast("double")
    val lengthScore = least(nTok / lit(200.0), lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    val digitRatio = digitCount(text).cast("double") / greatest(nChar, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChar, lit(1.0))
    lit(0.4) * lengthScore + lit(0.4) * least(stopRatio * lit(4.0), lit(1.0)) +
      lit(0.1) * (lit(1.0) - least(digitRatio * lit(10.0), lit(1.0))) +
      lit(0.1) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0)))
  }

  /** N-gram language ID heuristic: English iff the stopword token ratio
    * clears a threshold. A real pipeline would score character n-grams per
    * language; the operator shape (pure projection, no shuffle) is the same. */
  def langId(text: Column, threshold: Double = 0.03): Column = {
    val nTok = wordCount(text).cast("double")
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    when(nTok === 0.0, lit("unknown"))
      .when(stopRatio >= threshold, lit("en"))
      .otherwise(lit("unknown"))
  }

  /** Content fingerprint (md5 hex) — the exact-dedup key. Stable across
    * engines and runs, unlike xxhash64 which is Spark-specific. */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Full text-stats projection over a documents table. */
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      wordCount(t).as("n_words"),
      tokenEstimate(t).as("n_tokens_est"),
      stopwordCount(t).as("n_stopwords"),
      digitCount(t).as("n_digits"),
      punctCount(t).as("n_punct"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}
