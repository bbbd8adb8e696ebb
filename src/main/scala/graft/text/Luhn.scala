package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Credit-card-number detection with Luhn verification — the PII tier
  * the public corpus pipelines (Dolma's PII tagger, BigScience ROOTS —
  * both public) run beyond m20's regex scrub: a 13–19-digit run is only
  * PII when its Luhn checksum (ISO/IEC 7812, public) validates, which
  * cuts the false-positive mass of order ids, timestamps and serial
  * numbers that a bare digit-run regex would scrub.
  *
  * Candidates are digit runs with optional single-space/hyphen
  * separators (`[0-9][0-9 -]{11,22}[0-9]`, no lookarounds — the regex
  * must mean the same thing in Java regex and RE2/DuckDB for the oracle
  * replay), kept when the separator-stripped digit count is 13–19.
  * Luhn: from the RIGHT, double every second digit, subtract 9 above 9,
  * valid iff the sum ≡ 0 (mod 10) — implemented as codegen'd collection
  * expressions (transform/aggregate over the reversed digit string), no
  * UDF, and replayed digit-for-digit in SQL.
  *
  * Scale shape: pure per-document projection — zero exchanges, the m20
  * contract; the regex scan is the cost and it rides the same pass as
  * any other per-doc rule battery.
  */
object Luhn {

  /** Digit runs with optional single separators, 13–25 chars — the
    * pre-filter; real length gating happens on the stripped digits. */
  val CandidateRe = "[0-9][0-9 -]{11,22}[0-9]"

  private def digitsOnly(s: Column): Column = regexp_replace(s, "[ -]", "")

  /** Luhn validity of a pure digit string (codegen'd, no UDF): 1-based
    * positions over the REVERSED string, odd positions plain (the check
    * digit is position 1), even positions doubled with the −9 fold. */
  def isLuhnValid(ds: Column): Column = {
    val rev = reverse(ds)
    val terms = transform(sequence(lit(1), length(ds)), i => {
      val d = ascii(rev.substr(i, lit(1))) - lit(48)
      when(i % 2 === 1, d)
        .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Per-document card-detection counts: (doc_id, n_candidates,
    * n_cc_valid) over docs with non-null text — n_candidates counts
    * digit runs in the 13–19-digit range, n_cc_valid the Luhn-verified
    * subset (the ones a scrub would actually redact). */
  def cardCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val cands = filter(
      regexp_extract_all(col(textCol), lit(CandidateRe), lit(0)),
      s => length(digitsOnly(s)).between(13, 19))
    docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"),
        size(cands).cast("long").as("n_candidates"),
        size(filter(cands, s => isLuhnValid(digitsOnly(s))))
          .cast("long").as("n_cc_valid"))
  }
}
