package graft.text

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // The textbook corpus (the public HuggingFace tokenizers course's
  // WordPiece walkthrough): word frequencies hug:10 pug:5 pun:12 bun:4
  // hugs:5. Initial splits give piece freqs h:15 ##u:36 ##g:20 ##n:16
  // p:17 b:4 ##s:5 and pair scores
  //   (##g,##s) = 5/(20·5) = 1/20   ← strictly best
  //   every other pair        = 1/36,
  // so merge 1 is "##gs". After it every remaining pair scores exactly
  // 1/36; the deterministic tie-break (lexicographically smallest pair)
  // picks ("##u","##g") → merge 2 is "##ug".
  private def corpus = Seq(
    (1L, Seq.fill(10)("hug").mkString(" ")),
    (2L, Seq.fill(5)("pug").mkString(" ")),
    (3L, Seq.fill(12)("pun").mkString(" ")),
    (4L, Seq.fill(4)("bun").mkString(" ")),
    (5L, Seq.fill(5)("hugs").mkString(" "))).toDF("doc_id", "text")

  test("trains the textbook merge sequence with the likelihood score") {
    val m = WordPiece.trainDistributed(corpus, nMerges = 2, maxWords = 0)
    m.displayPieces shouldBe Vector(
      "##g", "##n", "##s", "##u", "b", "h", "p", // display-sorted alphabet
      "##gs", "##ug")                             // merges in rank order
    // classes are structural, not string prefixes
    m.bare shouldBe Set("b", "h", "p")
    m.contNets shouldBe Set("g", "n", "s", "u", "gs", "ug")
  }

  test("MaxMatch encode: longest piece first, continuation prefix, UNK fallback") {
    val m = WordPiece.trainDistributed(corpus, nMerges = 2, maxWords = 0)
    WordPiece.encodeWord("hugs", m) shouldBe Vector("h", "##ug", "##s")
    WordPiece.encodeWord("hug", m) shouldBe Vector("h", "##ug")
    WordPiece.encodeWord("bun", m) shouldBe Vector("b", "##u", "##n")
    // 'm' is not in the alphabet → the WHOLE word fails to [UNK], even
    // though 'un' would have matched further in (the BERT contract).
    WordPiece.encodeWord("mun", m) shouldBe Vector(WordPiece.Unk)
    // word-initial '##u' must NOT match bare position 0: 'u' alone has
    // no bare piece, so "ug" is [UNK] despite ##ug existing.
    WordPiece.encodeWord("ug", m) shouldBe Vector(WordPiece.Unk)
  }

  test("tokenStats counts tokens and UNK words per document") {
    val m = WordPiece.trainDistributed(corpus, nMerges = 2, maxWords = 0)
    val docs = Seq((1L, "hugs bun mun"), (2L, ""), (3L, "pun pun")).toDF("doc_id", "text")
    val out = WordPiece.tokenStats(docs, m).orderBy("doc_id").collect()
    // hugs=3 tokens, bun=3, mun=[UNK]=1 → 7 tokens, 1 unk word.
    out(0).getAs[Long]("n_words") shouldBe 3
    out(0).getAs[Long]("n_wp_tokens") shouldBe 7
    out(0).getAs[Long]("n_unk_words") shouldBe 1
    out(0).getAs[Double]("wp_per_word") shouldBe (7.0 / 3) +- 1e-12
    // empty doc: present with zero counts (the m40 contract).
    out(1).getAs[Long]("n_words") shouldBe 0
    out(1).getAs[Double]("wp_per_word") shouldBe 0.0
    out(2).getAs[Long]("n_wp_tokens") shouldBe 2 * 3
    out(2).getAs[Long]("n_unk_words") shouldBe 0
  }

  test("training is invariant to input partitioning") {
    val a = WordPiece.trainDistributed(corpus, nMerges = 4, maxWords = 0)
    val b = WordPiece.trainDistributed(corpus.repartition(7), nMerges = 4, maxWords = 0)
    b.pieces shouldBe a.pieces
  }

  test("merge budget beyond the pair supply stops at exhaustion") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = WordPiece.trainDistributed(tiny, nMerges = 50, maxWords = 0)
    // alphabet {##b, a} + the single possible merge "ab".
    m.displayPieces shouldBe Vector("##b", "a", "ab")
    WordPiece.encodeWord("ab", m) shouldBe Vector("ab")
  }

  test("'#'-bearing words cannot alias bare and continuation pieces (typed classes)") {
    // Word "#ab": bare '#', continuations ##a, ##b — a corpus of
    // markdown-ish tokens. The nets 'a'/'b' exist only as
    // CONTINUATIONS, so a word STARTING with 'a' must be [UNK] even
    // though the string "##a"-as-display exists; under string-prefix
    // classification (review r16) this aliased and diverged from the
    // oracle. Merges on this corpus can even produce a piece whose
    // display form is literally "##" (bare '#' + ##'#') — nets stay
    // non-empty by construction, so the replay cursor always advances.
    val docs = Seq((1L, "#ab #ab ##c")).toDF("doc_id", "text")
    val m = WordPiece.trainDistributed(docs, nMerges = 0, maxWords = 0)
    m.bare shouldBe Set("#")
    m.contNets shouldBe Set("#", "a", "b", "c")
    WordPiece.encodeWord("#ab", m) shouldBe Vector("#", "##a", "##b")
    WordPiece.encodeWord("ab", m) shouldBe Vector(WordPiece.Unk)
    val merged = WordPiece.trainDistributed(docs, nMerges = 3, maxWords = 0)
    merged.pieces.foreach { case (_, net) => net should not be empty }
    WordPiece.encodeWord("##c", merged).head should not be empty
  }

  test("per-source fertility and UNK rate reconcile with the per-doc frame") {
    // train on the textbook corpus; score a corpus with a known-vocab
    // source and an out-of-alphabet source
    val m = WordPiece.trainDistributed(corpus, nMerges = 2, maxWords = 0)
    val scored = Seq(
      (1L, "hugs hug", "in"),    // 3 + 2 tokens, 0 unk
      (2L, "bun pun", "in"),     // 3 + 3 tokens, 0 unk
      (3L, "mun zap", "out"),    // both [UNK]
      (4L, "hug mun", "out")     // 2 tokens + [UNK]
    ).toDF("doc_id", "text", "source")
    val perDoc = WordPiece.tokenStats(scored, m)
      .join(scored.select("doc_id", "source"), Seq("doc_id"))
    val agg = perDoc.groupBy("source").agg(
      org.apache.spark.sql.functions.sum("n_wp_tokens").as("wp"),
      org.apache.spark.sql.functions.sum("n_unk_words").as("unk"),
      org.apache.spark.sql.functions.sum("n_words").as("w"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    agg("in") shouldBe ((11L, 0L, 4L))
    agg("out") shouldBe ((5L, 3L, 4L))  // (1+1) + (2+1) tokens; 3 unk words
    // fertility/unk_rate as the m143 card computes them
    (agg("out")._2.toDouble / agg("out")._3) shouldBe 0.75 +- 1e-12
  }

  test("empty corpus yields an empty model and every word encodes to UNK") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = WordPiece.trainDistributed(empty, nMerges = 3, maxWords = 0)
    m.pieces shouldBe Vector.empty
    WordPiece.encodeWord("x", m) shouldBe Vector(WordPiece.Unk)
  }
}
