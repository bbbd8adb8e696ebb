package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece — the third canonical subword family (Schuster & Nakajima
  * 2012; the BERT tokenizer; trainer + MaxMatch encode as documented in
  * the public HuggingFace tokenizers course). Complements BPE (m40,
  * frequency-greedy merges, open vocabulary) and unigram-LM (m135,
  * probabilistic prune): WordPiece merges by the LIKELIHOOD ratio
  * score(x,y) = freq(xy) / (freq(x)·freq(y)) — a pair merges when its
  * parts co-occur more than independence predicts, not merely often —
  * and its encoder is greedy LONGEST-MATCH-FIRST with an explicit [UNK]
  * fallback for unmatchable words (the closed-vocabulary accounting BPE
  * doesn't have).
  *
  * Conventions (the BERT ones): a word's first character is a bare
  * piece, every continuation character is prefixed "##"; a merge of
  * (x, ##y) yields x·y (prefix of the LEFT survives); encode fails the
  * WHOLE word to [UNK] if any position has no matching piece.
  *
  * Scale shape — identical to [[Bpe]] by construction: TRAIN's pair and
  * piece frequencies are pure functions of the word-frequency table
  * ([[WordTables.withCapped]] — the corpus is touched ONCE, by a
  * vocabulary-bounded count exchange), the fitted model is a few
  * thousand strings riding the encode closure, and ENCODE is one
  * shuffle-free map with a per-partition word→count memo (Zipf
  * amortization). Determinism: merge selection breaks score ties on the
  * lexicographically smallest pair, and scores compare as exact cross
  * products of the integer frequencies (never as floating ratios), so
  * the model is a pure function of the table.
  */
object WordPiece {

  val Unk = "[UNK]"
  val Cont = "##"

  /** `pieces` in deterministic vocabulary order: the sorted initial
    * alphabet first, then merged tokens in rank order — the captured
    * form the oracle replays encode from. */
  final case class Model(pieces: Vector[String]) {
    @transient lazy val vocab: Set[String] = pieces.toSet
    /** Longest piece length NET of the ## prefix — the MaxMatch probe
      * bound. */
    @transient lazy val maxNetLen: Int =
      if (pieces.isEmpty) 0
      else pieces.iterator.map(p =>
        if (p.startsWith(Cont)) p.length - Cont.length else p.length).max
  }

  private def toSymbols(word: String): Vector[String] =
    word.head.toString +: word.tail.map(c => Cont + c).toVector

  private def mergeSyms(a: String, b: String): String =
    a + b.stripPrefix(Cont)

  /** Greedy longest-match-first encode of one word: at each position
    * take the longest vocabulary piece matching (##-prefixed when not
    * word-initial); any position with no match fails the whole word to
    * a single [UNK] (the BERT contract). */
  def encodeWord(word: String, model: Model): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var j = math.min(word.length, i + model.maxNetLen)
      var hit: String = null
      while (hit == null && j > i) {
        val cand =
          if (i == 0) word.substring(i, j)
          else Cont + word.substring(i, j)
        if (model.vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Vector(Unk)
      out += hit
      i = j
    }
    out.result()
  }

  /** Learn `nMerges` likelihood-scored merges from the FULL corpus — the
    * production trainer, sharing [[WordTables.withCapped]]'s corpus
    * contract (one word-count exchange, count-bounded table, loud drop
    * report) with the BPE and unigram trainers. */
  def trainDistributed(docs: DataFrame, nMerges: Int,
                       textCol: String = "text",
                       maxWords: Int = 1 << 16): Model = {
    require(nMerges >= 0, "nMerges must be non-negative")
    WordTables.withCapped(docs, textCol, maxWords, "wordpiece") { (_, table) =>
      mergeLoop(table.toMap, nMerges)
    }
  }

  /** The merge loop over a word-frequency table. Each step counts piece
    * and adjacent-pair frequencies (Σ over words of f × occurrences),
    * picks the pair maximizing freq(xy)/(freq(x)·freq(y)) — compared as
    * exact Long/BigInt cross products, ties to the lexicographically
    * smallest pair — merges every occurrence, and records the merged
    * piece. Stops when the budget is spent or no pair remains. */
  private def mergeLoop(wordFreq: scala.collection.Map[String, Long],
                        nMerges: Int): Model = {
    var words = wordFreq.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, f) => (toSymbols(w), f) }.toVector
    // Initial alphabet in sorted order — bare initials + ## continuations.
    val alphabet = words.iterator.flatMap(_._1).toVector.distinct.sorted
    val merged = Vector.newBuilder[String]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val pieceFreq = scala.collection.mutable.HashMap.empty[String, Long]
      val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          pieceFreq.update(syms(i), pieceFreq.getOrElse(syms(i), 0L) + f)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairFreq.update(p, pairFreq.getOrElse(p, 0L) + f)
          }
          i += 1
        }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        // argmax of n/(fx·fy) without floating point: a/(b) > c/(d) ⇔
        // a·d > c·b over BigInt (frequencies can reach corpus scale,
        // so the cross product needs 128 bits).
        var best: (String, String) = null
        var bn = BigInt(0); var bd = BigInt(1)
        pairFreq.iterator.toSeq.sortBy(_._1).foreach { case ((x, y), n) =>
          val den = BigInt(pieceFreq(x)) * BigInt(pieceFreq(y))
          val cmp = (BigInt(n) * bd).compare(bn * den)
          if (best == null || cmp > 0) { best = (x, y); bn = BigInt(n); bd = den }
        }
        merged += mergeSyms(best._1, best._2)
        val (a, b) = best
        words = words.map { case (syms, f) =>
          if (!syms.indices.init.exists(i => syms(i) == a && syms(i + 1) == b)) (syms, f)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += mergeSyms(a, b); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }
        }
        step += 1
      }
    }
    Model(alphabet ++ merged.result())
  }

  /** Per-document WordPiece accounting: (doc_id, n_words, n_wp_tokens,
    * n_unk_words, wp_per_word) — the m40 token-budget card for the
    * closed-vocabulary tokenizer, plus the UNK count that vocabulary's
    * coverage gaps show up as. One shuffle-free map; per-partition word
    * memo. */
  def tokenStats(docs: DataFrame, model: Model,
                 textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val narrowed = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id").cast("long"), lower(trim(col(textCol))))
      .as[(Long, String)]
    narrowed.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, (Int, Int)]
      it.map { case (id, text) =>
        val ws = text.split(" +").filter(_.nonEmpty)
        var tok = 0L; var unk = 0L
        ws.foreach { w =>
          val (n, u) = memo.getOrElseUpdate(w, {
            val enc = encodeWord(w, model)
            (enc.length, if (enc.headOption.contains(Unk)) 1 else 0)
          })
          tok += n; unk += u
        }
        val nWords = ws.length.toLong
        (id, nWords, tok, unk,
          if (nWords == 0) 0.0 else tok.toDouble / nWords)
      }
    }.toDF("doc_id", "n_words", "n_wp_tokens", "n_unk_words", "wp_per_word")
  }
}
