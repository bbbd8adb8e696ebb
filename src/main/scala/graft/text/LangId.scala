package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained character-n-gram language identifier (m137) — the
  * CCNet-style LID tier (Wenzek et al. 2020 "CCNet"; Joulin et al. 2017
  * fastText — both public): a multinomial logistic-regression classifier
  * over HASHED character 2–4-grams, trained on a labeled set and scoring
  * every document with (pred_lang, margin). This replaces the en/other
  * stopword heuristic ([[TextOps.langId]]) as the engine's language
  * classifier: the heuristic stays as the m02 gate's cheap cut, the
  * trained model is the multilingual tier a 100 TB corpus needs
  * (round-15 verdict ask #1).
  *
  * Features: every character n-gram (n ∈ 2..4) of the normalized text
  * (trim → lowercase → collapse space runs), hashed into [[D]] buckets
  * by the first 48 bits of md5 — md5, not xxhash, so the DuckDB oracle
  * replays the identical buckets ([[graft.OracleModelSql]]), the
  * engine-portability contract every operator here follows. A doc's
  * feature vector is its normalized bucket counts (x_i = cnt_i / n).
  *
  * Training — the [[QualityClassifier.trainDistributed]] recipe, shared
  * loop ([[FixedPointGd]]): full-batch softmax-cross-entropy GD where
  * each iteration's (loss, gradient) is ONE distributed aggregate of
  * exact fixed-point integers (#partitions × (1 + K·D) integers on
  * the wire), so the trained weights are bit-identical under any input
  * partitioning, the deterministic early stop decides identically
  * everywhere, and the captured weights replay exactly. Labels come
  * from a CURATED LABELED SET (here the planted per-language docs the
  * query tier synthesizes — the corpus's own `lang` column is a
  * metadata tag over language-free fixture text; in production this is
  * Wikipedia/Tatoeba-style labeled data), and scoring is the
  * corpus-wide pass.
  *
  * Scoring — one compiled shuffle-free pass (the [[UnigramLm.tokenStats]]
  * shape): the QUANTIZED weights (rint(w·2^32) longs) ride the closure;
  * per document z_c = Σ_grams wq_c[bucket] is EXACT integer
  * arithmetic, so argmax/margin are order-free and the DuckDB replay
  * (same integers via a VALUES weight table) agrees bit-for-bit —
  * including `margin = ((z₁ − z₂) / 2^32) / n`, two IEEE divisions of
  * identical operands. Ties break to the lowest class index. Documents
  * with fewer than 2 normalized chars have no grams → ('unknown', 0.0).
  * Overflow headroom: |z| ≤ n_grams · max|wq| — at |w| ≤ 100 a document
  * needs > 2^25 grams (a ~10 MB text) to approach 2^63.
  *
  * Scale shape (100 TB): training reads only the labeled set; scoring
  * is one projection pass over the corpus, no shuffle, model in the
  * closure. D = 1024 is fixture-sized; a production vocabulary would
  * raise it (fastText uses 2^21 hashed bins) — the topology is
  * unchanged since the model stays closure-sized either way.
  */
object LangId {

  /** Hashed feature buckets. */
  val D = 1024

  /** The planted per-language training paragraphs (top-frequency word
    * lists of each language — public knowledge), sorted by language
    * code. The testdata generator's `lang` column is a metadata tag
    * over language-free fixture text, so the labeled TRAINING set is
    * synthesized from these (the withSyntheticDups/withSyntheticPii
    * fixture-augmentation convention): doc i of the planted block gets
    * language PlantedPhrases(i % 5) and text = trim(repeat(phrase ∥ ' ',
    * 1 + i % 3)) — a formula both engines construct identically, so the
    * oracle replays the exact corpus. */
  val PlantedPhrases: Seq[(String, String)] = Seq(
    "de" -> ("der die und in den von zu das mit sich des auf für ist im " +
      "dem nicht ein eine als auch es an werden aus er hat dass sie nach " +
      "wird bei einer um am sind noch wie"),
    "en" -> ("the of and to in a is that it was for on are with as his " +
      "they be at one have this from or had by word but what some we can " +
      "out other were all there when up use"),
    "es" -> ("el la de que y a en un ser se no haber por con su para " +
      "como estar tener le lo todo pero más hacer o poder decir este ir " +
      "otro ese si me ya ver"),
    "fr" -> ("le de un être et à il avoir ne je son que se qui ce dans " +
      "en du elle au pour pas vous par sur faire plus dire me on mon lui " +
      "nous comme mais"),
    "zh" -> ("的 一 是 不 了 人 我 在 有 他 这 为 之 大 来 以 个 中 上 们 " +
      "到 说 国 和 地 也 子 时 道 出 而 要 于 就 下 得 可 你 年 生"))

  /** Planted training docs per corpus (60 per language). */
  val PlantedCount = 300

  /** n-gram lengths. */
  val Ns: Seq[Int] = Seq(2, 3, 4)

  /** Quantization scale for the scoring weights (2^32): captured longs
    * rint(w·2^32), so scoring is exact integer arithmetic in both
    * engines. */
  val QScale32 = 4294967296.0

  /** Trained model: `classes` sorted ascending; `w(c)` holds the D
    * bucket weights of class c. BIAS-FREE (the fastText linear layer
    * shape): with per-gram features of mass 1/n each, an intercept's
    * unit feature dominates the Hessian and caps the stable step size
    * ~30× below what the bucket weights tolerate — measured on the
    * planted set: WITH a bias, losses oscillate from lr 12 up and the
    * monotone lr 10 needs 766 iterations to the stop; WITHOUT it, lr
    * 300 is monotone and stops at 118 (still monotone at lr 10000).
    * The labeled set is class-balanced by construction, so the
    * intercept carries no information here; a skewed labeled corpus
    * would re-balance by sampling (the standard LID practice) rather
    * than re-introduce the ill-conditioned intercept. */
  /** `classCounts(c)` = labeled examples of class c the trainer saw —
    * the per-class SUPPORT a confusion/calibration card must disclose
    * (a 99%-accurate class trained on 3 examples is not a 99% class;
    * round-16 verdict ask #7). */
  final case class Model(classes: Array[String], w: Array[Array[Double]],
                         nTrain: Long, losses: Array[Double],
                         classCounts: Array[Long]) {
    /** The quantized weights the scoring pass and the oracle replay
      * share: rint(w·2^32) as longs. */
    def quantized: Array[Array[Long]] =
      w.map(wc => Array.tabulate(D)(i => math.rint(wc(i) * QScale32).toLong))
  }

  /** Normalization matched to the ORACLE's semantics, codepoint by
    * codepoint: strip ASCII spaces at the ends, SIMPLE per-codepoint
    * lowercase (`Character.toLowerCase(int)` — exactly DuckDB
    * `lower()`'s utf8proc mapping; Java's full-string `toLowerCase`
    * would diverge on special-casing chars like İ → "i̇" where DuckDB
    * yields "i"), collapse runs of ASCII spaces — the semantics of
    * `regexp_replace(lower(trim(text)), ' +', ' ')` in DuckDB. */
  private[text] def normalize(s: String): String = {
    val t = RepeatedWindows.sparkTrim(s)
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    var lastSpace = false
    while (i < t.length) {
      val cp = t.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ') {
        if (!lastSpace) sb.append(' ')
        lastSpace = true
      } else {
        lastSpace = false
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
    }
    sb.toString
  }

  /** Feature bucket of one gram: first 48 bits of md5(UTF-8 bytes) mod
    * [[D]] — replayed in SQL as ('0x' || substr(md5(g), 1, 12))::BIGINT
    * % D. */
  private[text] def bucketOf(md: java.security.MessageDigest,
                             gram: String): Int = {
    md.reset()
    val h = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
      ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
      ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
    (v % D).toInt
  }

  /** Fold every 2..4-gram bucket of `t` into `f`; returns the gram
    * count. Gram boundaries are CODEPOINTS, not UTF-16 units — DuckDB's
    * substr/len count codepoints, and a UTF-16-based gram would split
    * surrogate pairs on astral chars (getBytes then yields '?' and
    * every downstream bucket diverges). The substring is taken at the
    * codepoint's UTF-16 offsets, so its UTF-8 bytes (and md5) equal the
    * oracle's md5(substr(t, i, n)). */
  private def eachGram(md: java.security.MessageDigest, t: String)
                      (f: Int => Unit): Long = {
    // offsets(k) = UTF-16 index where codepoint k starts
    val offsets = new Array[Int](t.codePointCount(0, t.length) + 1)
    var k = 0
    var i = 0
    while (i < t.length) {
      offsets(k) = i
      k += 1
      i += Character.charCount(t.codePointAt(i))
    }
    offsets(k) = t.length
    var n = 0L
    Ns.foreach { len =>
      var j = 0
      while (j + len <= k) {
        f(bucketOf(md, t.substring(offsets(j), offsets(j + len))))
        n += 1L
        j += 1
      }
    }
    n
  }

  /** Feature rows per cached training partition (fat rows: a sparse
    * vector up to D entries ≈ 12 KB/doc → ~200 MB per partition). */
  private val TrainRowsPerPartition = 1L << 14

  /** PRODUCTION trainer over the labeled set: multinomial LR by exact
    * fixed-point full-batch GD ([[FixedPointGd.loop]] — one distributed
    * aggregate per iteration, deterministic early stop, bit-identical
    * under any partitioning). `docs` needs (`langCol`, `textCol`); rows
    * with null label/text or no grams are excluded. */
  def train(docs: DataFrame, textCol: String = "text",
            langCol: String = "lang", iters: Int = 500, lr: Double = 300.0,
            stopInv: Long = FixedPointGd.DefaultStopInv): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val narrowed = docs
      .filter(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).cast("string"), col(textCol))
      .as[(String, String)]
    // (label, sorted bucket ids, normalized counts): the sufficient rows
    val feats = narrowed.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (lang, text) =>
        val t = normalize(text)
        val counts = new Array[Int](D)
        val n = eachGram(md, t)(i => counts(i) += 1)
        if (n == 0L) None
        else {
          val idxs = (0 until D).filter(counts(_) > 0).toArray
          val xs = idxs.map(i => counts(i).toDouble / n)
          Some((lang, idxs, xs))
        }
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count()
      if (n == 0L)
        return Model(Array.empty, Array.empty, 0L, Array.empty, Array.empty)
      // class list: bounded by the number of languages, sorted; the
      // per-class support rides the same bounded reduction
      val byClass = feats.map(l => (l._1, 1L)).reduceByKey(_ + _)
        .collect().toMap // ≤ #classes rows
      val classes = byClass.keys.toArray.sorted
      val clsIdx = classes.zipWithIndex.toMap
      val k = classes.length
      val dim = k * D
      val rdd0 = feats.map { case (lang, idxs, xs) => (clsIdx(lang), idxs, xs) }
      // Driver-local fast path (FixedPointGd.LocalTrainMaxRows): the
      // quantized accumulation is order-independent, so the driver fold
      // is bit-identical to the per-partition fold — it just skips one
      // scheduling barrier per iteration (asset:langmodel/labeledlang
      // were ~3 s each, mostly the 500 per-iteration job barriers).
      if (n <= FixedPointGd.LocalTrainMaxRows) {
        val local = rdd0.collect()
        val (wFlat, losses) = FixedPointGd.loop(n, dim, iters, lr, stopInv, { w =>
          val acc = new FixedPointGd.ExactAcc(dim + 1)
          local.foreach { case (y, idxs, xs) => accumulate(acc, w, k, y, idxs, xs) }
          acc.sums
        })
        val wL = Array.tabulate(k)(c => Array.tabulate(D)(j => wFlat(c * D + j)))
        return Model(classes, wL, n, losses, classes.map(byClass))
      }
      val parts = math.min(feats.getNumPartitions.toLong,
        (n - 1) / TrainRowsPerPartition + 1).toInt
      // re-cache frame-sized (the QualityClassifier.trainDistributed
      // partitioning rule: iterate over partitions sized by THIS frame,
      // not the corpus layout), releasing the scan-shaped cache once
      val rdd =
        if (parts < feats.getNumPartitions) {
          val r = rdd0.coalesce(parts)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count()
          feats.unpersist(blocking = false)
          r
        } else {
          val r = rdd0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count()
          feats.unpersist(blocking = false)
          r
        }
      try {
        val (wFlat, losses) = FixedPointGd.loop(n, dim, iters, lr, stopInv, { w =>
          val wSnap = w.clone()
          val partials = rdd.mapPartitions { it =>
            val acc = new FixedPointGd.ExactAcc(dim + 1)
            it.foreach { case (y, idxs, xs) =>
              accumulate(acc, wSnap, k, y, idxs, xs)
            }
            Iterator.single(acc.sums)
          }.collect() // ≤ #partitions rows × (dim+1) BigInts
          val tot = Array.fill(dim + 1)(BigInt(0))
          partials.foreach { p =>
            var j = 0
            while (j < tot.length) { tot(j) += p(j); j += 1 }
          }
          tot
        })
        val w = Array.tabulate(k)(c =>
          Array.tabulate(D)(j => wFlat(c * D + j)))
        Model(classes, w, n, losses, classes.map(byClass))
      } finally rdd.unpersist(blocking = false)
    } finally feats.unpersist(blocking = false)
  }

  /** One row's quantized (loss, gradient) contribution — softmax
    * cross-entropy, z folded in fixed (class, ascending-bucket) order,
    * every contribution rint(·2^53)-quantized before the integer sum
    * (the [[QualityClassifier]] accumulate contract, K classes wide). */
  private def accumulate(acc: FixedPointGd.ExactAcc, w: Array[Double],
                         k: Int, y: Int, idxs: Array[Int],
                         xs: Array[Double]): Unit = {
    val z = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * D
      var s = 0.0
      var j = 0
      while (j < idxs.length) { s += w(base + idxs(j)) * xs(j); j += 1 }
      z(c) = s
      c += 1
    }
    var m = Double.NegativeInfinity
    c = 0
    while (c < k) { if (z(c) > m) m = z(c); c += 1 }
    var denom = 0.0
    c = 0
    while (c < k) { denom += math.exp(z(c) - m); c += 1 }
    val py = math.exp(z(y) - m) / denom
    acc.add(0, math.rint(-math.log(math.max(py, 1e-15)) *
      FixedPointGd.QScale).toLong)
    c = 0
    while (c < k) {
      val e = math.exp(z(c) - m) / denom - (if (c == y) 1.0 else 0.0)
      val base = c * D
      var j = 0
      while (j < idxs.length) {
        acc.add(1 + base + idxs(j),
          math.rint(e * xs(j) * FixedPointGd.QScale).toLong)
        j += 1
      }
      c += 1
    }
  }

  /** Score every document — one compiled shuffle-free pass with the
    * quantized weights in the closure: (doc_id, lang, pred_lang, margin,
    * n_grams). Null-text docs are excluded (no features — the m83
    * convention); gram-less docs report ('unknown', 0.0, 0). */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            langCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wq = model.quantized
    val classes = model.classes
    val k = classes.length
    docs.filter(col(textCol).isNotNull)
      .select(col("doc_id").cast("long"), col(langCol).cast("string"),
        col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, lang, text) =>
          val t = normalize(text)
          val zq = new Array[Long](k)
          val n = eachGram(md, t) { i =>
            var c = 0
            while (c < k) { zq(c) += wq(c)(i); c += 1 }
          }
          if (n == 0L || k == 0) (docId, lang, "unknown", 0.0, 0L)
          else {
            var best = 0
            var c = 1
            while (c < k) { if (zq(c) > zq(best)) best = c; c += 1 }
            var second = -1
            c = 0
            while (c < k) {
              if (c != best && (second < 0 || zq(c) > zq(second))) second = c
              c += 1
            }
            val margin =
              if (second < 0) 0.0
              else ((zq(best) - zq(second)).toDouble / QScale32) / n.toDouble
            (docId, lang, classes(best), margin, n)
          }
        }
      }
      .toDF("doc_id", "lang", "pred_lang", "margin", "n_grams")
  }

  /** Calibrated scoring pass (m147): (doc_id, lang, pred_lang, conf_q)
    * where conf_q = floor(1e9 / Σ_c exp(((z_c − z_best)/2^32)/n)) — the
    * softmax probability of the PREDICTED class, quantized once to an
    * integer (the m98 discipline: every downstream bin/sum is integer
    * arithmetic). The denominator folds in FIXED class-index order and
    * every term's operands are the exact quantized integers both
    * engines share, so the doubles agree operation-for-operation; each
    * exponent is ≤ 0, so denom ∈ [1, K] and nothing overflows. Docs
    * with no grams carry no posterior and are absent (the confidence
    * of a featureless doc is not a calibration data point).
    *
    * Cross-engine edge (documented, not eliminable): exp() is 1-ulp-
    * accurate, not correctly rounded, so the two engines' denom can
    * differ by an ulp — consequential ONLY when 1e9/denom sits within
    * ~1 ulp of an integer AND that integer is a 1e8 decile boundary
    * (a doc would flip bins). mean_conf is immune (a ±1 conf_q moves
    * it by 1e-9/n, invisible at the 6-dp gate); this is the same
    * residual the m89 floor(ppl·1e6) integer key carries, green since
    * its round. */
  def scoreCalibrated(docs: DataFrame, model: Model,
                      textCol: String = "text",
                      langCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wq = model.quantized
    val classes = model.classes
    val k = classes.length
    docs.filter(col(textCol).isNotNull)
      .select(col("doc_id").cast("long"), col(langCol).cast("string"),
        col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (docId, lang, text) =>
          val t = normalize(text)
          val zq = new Array[Long](k)
          val n = eachGram(md, t) { i =>
            var c = 0
            while (c < k) { zq(c) += wq(c)(i); c += 1 }
          }
          if (n == 0L || k == 0) None
          else {
            var best = 0
            var c = 1
            while (c < k) { if (zq(c) > zq(best)) best = c; c += 1 }
            var denom = 0.0
            c = 0
            while (c < k) {
              denom += math.exp(((zq(c) - zq(best)).toDouble / QScale32) / n.toDouble)
              c += 1
            }
            Some((docId, lang, classes(best),
              math.floor(1e9 / denom).toLong))
          }
        }
      }
      .toDF("doc_id", "lang", "pred_lang", "conf_q")
  }
}
