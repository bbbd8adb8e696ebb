package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flesch reading-ease / Flesch–Kincaid grade card — the classic
  * readability proxy a curation run publishes next to the quality gates
  * (rule batteries in m91–m94, learned gate in m83): formula-based, so it
  * needs no model and replays exactly in SQL.
  *
  * Counting conventions (deterministic, regex-only — real syllabification
  * is dictionary work; the formulas were calibrated on heuristics of this
  * kind):
  *  - words: the corpus-wide whitespace tokenization ([[TextOps.tokens]]),
  *    keeping only tokens that contain at least one alphanumeric character
  *    (so punctuation-only tokens like "..." are not words and a
  *    punctuation-only doc is excluded by the n_words > 0 gate);
  *  - sentences: maximal `[.!?]+` runs end a sentence; segments that are
  *    blank after trimming don't count; a doc with words but no terminal
  *    punctuation is one sentence (floor 1 — also the /0 guard);
  *  - syllables: `[aeiouy]+` vowel groups per word, floored at 1 per word
  *    (the standard heuristic — "rhythm" has no aeiou vowel but one
  *    spoken syllable... and a y).
  *
  * Exactness: all three counts are exact integers; the two ratios and the
  * two linear combinations are computed in a fixed operand order, so the
  * DuckDB oracle reproduces the doubles bit-for-bit.
  *
  * Scale shape: one codegen'd projection over the pruned (doc_id, text)
  * scan — zero exchanges, the m91/m94 rule-card shape.
  */
object Readability {

  private def words(text: Column): Column =
    filter(split(lower(trim(text)), " +"), t => t.rlike("[a-z0-9]"))

  /** Per-word syllable counts, floored at 1. A word's vowel-group count is
    * `size(split(word, "[aeiouy]+")) - 1`: split keeps leading/trailing
    * empty segments (limit -1), so N vowel groups always yield N+1
    * segments, wherever they sit in the word. */
  private def syllables(ws: Column): Column =
    aggregate(
      transform(ws, w => greatest(lit(1L),
        (size(split(w, "[aeiouy]+")) - 1).cast("long"))),
      lit(0L), (acc, x) => acc + x)

  private def sentences(text: Column): Column =
    greatest(lit(1L),
      size(filter(split(text, "[.!?]+"), s => trim(s) =!= "")).cast("long"))

  /** (doc_id, n_sentences, n_words, n_syllables, words_per_sentence,
    * syllables_per_word, flesch_reading_ease, fk_grade) — one row per doc
    * with at least one word (the formulas are undefined on empty text). */
  def card(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val base = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"), sentences(col(textCol)).as("n_sentences"),
        size(ws).cast("long").as("n_words"), syllables(ws).as("n_syllables"))
      .filter(col("n_words") > 0)
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    base.select(col("doc_id"), col("n_sentences"), col("n_words"),
      col("n_syllables"), wps.as("words_per_sentence"),
      spw.as("syllables_per_word"),
      (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
        .as("flesch_reading_ease"),
      (lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("fk_grade"))
  }
}
