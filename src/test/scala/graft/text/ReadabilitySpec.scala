package graft.text

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def card(rows: (Long, String)*) =
    Readability.card(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("sentence, word and syllable counts on a hand-checked doc") {
    val out = card((0L, "The cat sat. The dog ran!"))
    val r = out(0L)
    r.getAs[Long]("n_sentences") shouldBe 2L
    // whitespace tokens keep punctuation: the cat sat. the dog ran!
    r.getAs[Long]("n_words") shouldBe 6L
    r.getAs[Long]("n_syllables") shouldBe 6L
    r.getAs[Double]("words_per_sentence") shouldBe 3.0
    r.getAs[Double]("syllables_per_word") shouldBe 1.0
    r.getAs[Double]("flesch_reading_ease") shouldBe
      (206.835 - 1.015 * 3.0 - 84.6 * 1.0)
    r.getAs[Double]("fk_grade") shouldBe (0.39 * 3.0 + 11.8 * 1.0 - 15.59)
  }

  test("syllable heuristic: vowel groups with a floor of 1 per word") {
    val out = card((1L, "banana rhythm grr queueing"))
    // banana→3 (a|a|a), rhythm→1 (y), grr→1 (floor),
    // queueing→1 ("ueuei" is one contiguous vowel run)
    out(1L).getAs[Long]("n_syllables") shouldBe (3L + 1L + 1L + 1L)
  }

  test("no terminal punctuation still counts as one sentence") {
    val out = card((2L, "hello world"))
    out(2L).getAs[Long]("n_sentences") shouldBe 1L
    out(2L).getAs[Double]("words_per_sentence") shouldBe 2.0
  }

  test("punctuation-only and blank docs are excluded; null text is excluded") {
    val out = card((3L, "..."), (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "ok."))
    out.keySet shouldBe Set(6L)
    out(6L).getAs[Long]("n_sentences") shouldBe 1L
    out(6L).getAs[Long]("n_words") shouldBe 1L
  }

  test("long monosyllabic sentences score easier than polysyllabic ones") {
    val out = card(
      (7L, "the big red fox ran to the den."),
      (8L, "considerable organizational implementation inevitably materializes."))
    out(7L).getAs[Double]("flesch_reading_ease") should be >
      out(8L).getAs[Double]("flesch_reading_ease")
    out(8L).getAs[Double]("fk_grade") should be >
      out(7L).getAs[Double]("fk_grade")
  }
}
