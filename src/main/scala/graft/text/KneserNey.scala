package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram LM — the smoothing the public
  * perplexity-filter canon actually ships (CCNet's KenLM models are
  * modified-KN; Kneser & Ney 1995, Chen & Goodman 1998, public). m43's
  * add-α LM answers "is this doc noise"; KN answers it with the
  * statistically right backoff: a word's unigram weight is how many
  * DISTINCT contexts it completes (continuation count), not its raw
  * frequency — "francisco" is frequent but follows only "san", so KN
  * stops it from inflating unseen-bigram scores the way raw-frequency
  * backoff does.
  *
  * Model (bigram interpolated KN over the count table c(a,b)):
  *   p(b|a)   = max(c(ab) − D, 0)/c(a·) + λ(a)·p_cont(b)
  *   λ(a)     = D · N1+(a·) / c(a·)              (mass the discount freed)
  *   p_cont(b)= max(N1+(·b) − D, 0)/N1+(··) + D·T/N1+(··) · 1/V
  *   D        = n1 / (n1 + 2·n2)                 (Ries estimate from the
  *              counts-of-counts; Chen & Goodman eq. 26 — n1/n2 = #bigram
  *              types seen once/twice)
  * with N1+(a·)/N1+(·b) the distinct-continuation/context counts,
  * N1+(··) the distinct-bigram-type total, T = |{b : N1+(·b) > 0}|, and
  * V the full token vocabulary (both slots) supplying the uniform base
  * the recursion terminates at. Every level sums to exactly 1 over its
  * support (spec-pinned): the discount clip never bites below zero
  * because realized counts are ≥ 1 ≥ D, and the freed mass is by
  * construction what the interpolation weight redistributes.
  *
  * Edges (documented, spec-pinned): n2 = 0 makes D = 1 — singleton
  * bigrams then carry zero direct mass and back off entirely, which is
  * the estimator's own verdict, not a failure; unseen CONTEXT scores
  * p_cont(b) outright (interpolation weight 1); a token never seen in
  * the second slot still gets the uniform leak D·T/(N1+(··)·V) > 0
  * whenever D > 0, so held-out scoring stays finite everywhere the
  * token is in-vocabulary. Fully out-of-vocabulary tokens take the same
  * 1/V uniform (improper by Σ ≤ 1 + V'/V, the standard open-vocabulary
  * concession — KenLM's explicit <unk> plays this role).
  *
  * Scale shape (100 TB) — identical to [[NgramLm]], by construction:
  * the corpus is touched twice (count pass + score pass, the documented
  * recompute-over-materialize call shared with m32/m43); every KN
  * statistic — context mass, both N1+ tables, the counts-of-counts
  * discount, T, V — is a re-aggregation of the bigram COUNT table,
  * never of text; the scalar statistics ride one broadcast 1-row frame;
  * and the score join's broadcast-vs-shuffle choice is left to AQE (the
  * LineDedup lesson: a minCount-pruned LM broadcasts, a raw crawl's
  * full table must not be forced to).
  */
object KneserNey {

  /** Score `docs` against a trained bigram count table: (doc_id,
    * n_bigrams, cross_entropy, perplexity) under interpolated KN.
    * Docs with < 2 tokens have no bigrams and are absent (the m43
    * contract). */
  def scoreAgainst(docs: DataFrame, counts: DataFrame,
                   textCol: String = "text"): DataFrame = {
    // Per-context statistics: mass c(a·) and distinct continuations
    // N1+(a·) — one re-aggregation of the count table.
    val ctx = counts.groupBy("a")
      .agg(sum("cab").as("ca"), count(lit(1)).as("n1p_fwd"))
    // Per-continuation statistic: distinct contexts N1+(·b).
    val cont = counts.groupBy("b").agg(count(lit(1)).as("n1p_bwd"))
    // Scalar statistics in ONE 1-row frame (no driver action, no
    // literals baked at plan time — the m43 vocab convention): the
    // distinct-bigram total N1+(··), the counts-of-counts discount,
    // T, and the vocabulary size.
    val vocab = counts
      .select(explode(array(col("a"), col("b"))).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("v"))
    val glob = counts.agg(
        count(lit(1)).cast("double").as("dd"),
        sum(when(col("cab") === 1L, 1L).otherwise(0L)).cast("double").as("n1"),
        sum(when(col("cab") === 2L, 1L).otherwise(0L)).cast("double").as("n2"),
        countDistinct(col("b")).cast("double").as("t"))
      .crossJoin(vocab)
      // D = n1/(n1 + 2 n2), guarded so the plan holds no 0/0 under
      // ANSI. (An empty count table is handled at the cross join: the
      // scalar frame filters to dd > 0, so empty model → empty scores
      // even for held-out docs arriving through the LEFT gram join.)
      .withColumn("disc",
        when(col("n1") + lit(2.0) * col("n2") > 0.0,
          col("n1") / (col("n1") + lit(2.0) * col("n2"))).otherwise(lit(0.0)))

    val d = col("disc")
    // Continuation probability — the KN unigram level, discounted once
    // more toward the uniform 1/V base (the recursion's last stop).
    val pCont =
      greatest(coalesce(col("n1p_bwd").cast("double"), lit(0.0)) - d, lit(0.0)) / col("dd") +
        d * col("t") / col("dd") / col("v")
    // Bigram level: seen context interpolates; unseen context IS the
    // continuation distribution (weight 1).
    val seenCtx = col("ca").isNotNull
    val caD = col("ca").cast("double")
    val p = when(seenCtx,
        greatest(coalesce(col("cab").cast("double"), lit(0.0)) - d, lit(0.0)) / caD +
          d * col("n1p_fwd").cast("double") / caD * pCont)
      .otherwise(pCont)

    NgramLm.gramsOf(docs, textCol)
      .join(counts, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .join(cont, Seq("b"), "left")
      // An EMPTY count table makes every denominator (dd, v) zero and
      // would NaN every held-out score through the LEFT gram join —
      // the contract is instead "empty model → empty scores" (the
      // empty-corpus convention): filtering the 1-row scalar frame to
      // dd > 0 collapses the cross join, and with it the output, to
      // zero rows (review r16).
      .crossJoin(broadcast(glob.filter(col("dd") > 0.0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(log(p))).as("cross_entropy"))
      .withColumn("perplexity", exp(col("cross_entropy")))
  }

  /** Self-perplexity: train and score on the same corpus — the
    * no-external-LM quality gate under the canon smoothing. Every gram
    * is realized, so no backoff branch can hit a zero: the output is
    * finite by construction. */
  def selfPerplexity(docs: DataFrame, textCol: String = "text",
                     minCount: Long = 1L): DataFrame =
    scoreAgainst(docs, NgramLm.bigramCounts(docs, textCol, minCount), textCol)

  /** MODIFIED Kneser–Ney (Chen & Goodman 1998 §3, the KenLM default) —
    * per-count discounts instead of m138's single D:
    *   Y  = n1/(n1 + 2·n2)
    *   D1 = 1 − 2Y·n2/n1,  D2 = 2 − 3Y·n3/n2,  D3+ = 3 − 4Y·n4/n3
    *   λ(a) = (D1·N1(a·) + D2·N2(a·) + D3+·N3+(a·)) / c(a·)
    * with n_k the count-of-counts and Nk(a·) the per-context type
    * counts at count k. Discounts are clipped at 0 (the standard
    * guard), and each undefined ratio degrades deterministically:
    * n1 = 0 → D1 := 0 (no singleton types exist for it to apply to),
    * n2 = 0 → D2 := 0 (likewise), n3 = 0 with c ≥ 3 types present →
    * D3+ := Y (the single-discount estimate — a documented engineering
    * fallback for tiny corpora; Chen & Goodman assume n3 > 0). Because
    * λ(a) redistributes exactly what the clipped discounts removed,
    * Σ_b p(b|a) = 1 per seen context holds for EVERY guard branch
    * (spec-pinned). The continuation level is m138's unchanged —
    * modified discounts at the top level only, a documented
    * simplification (full mKN also modifies lower orders).
    *
    * Scale shape identical to [[scoreAgainst]]: four count-of-count
    * scalars and three per-context type counts are re-aggregations of
    * the bigram COUNT table; nothing new touches text. */
  def modifiedScoreAgainst(docs: DataFrame, counts: DataFrame,
                           textCol: String = "text"): DataFrame = {
    val ctx = counts.groupBy("a").agg(
      sum("cab").as("ca"),
      count(lit(1)).as("n1p_fwd"),
      sum(when(col("cab") === 1L, 1L).otherwise(0L)).cast("double").as("t1"),
      sum(when(col("cab") === 2L, 1L).otherwise(0L)).cast("double").as("t2"),
      sum(when(col("cab") >= 3L, 1L).otherwise(0L)).cast("double").as("t3"))
    val cont = counts.groupBy("b").agg(count(lit(1)).as("n1p_bwd"))
    val vocab = counts
      .select(explode(array(col("a"), col("b"))).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("v"))
    val glob = counts.agg(
        count(lit(1)).cast("double").as("dd"),
        sum(when(col("cab") === 1L, 1L).otherwise(0L)).cast("double").as("n1"),
        sum(when(col("cab") === 2L, 1L).otherwise(0L)).cast("double").as("n2"),
        sum(when(col("cab") === 3L, 1L).otherwise(0L)).cast("double").as("n3"),
        sum(when(col("cab") === 4L, 1L).otherwise(0L)).cast("double").as("n4"),
        countDistinct(col("b")).cast("double").as("t"))
      .crossJoin(vocab)
      .withColumn("y",
        when(col("n1") + lit(2.0) * col("n2") > 0.0,
          col("n1") / (col("n1") + lit(2.0) * col("n2"))).otherwise(lit(0.0)))
      .withColumn("d1",
        when(col("n1") > 0.0,
          greatest(lit(1.0) - lit(2.0) * col("y") * col("n2") / col("n1"), lit(0.0)))
          .otherwise(lit(0.0)))
      .withColumn("d2",
        when(col("n2") > 0.0,
          greatest(lit(2.0) - lit(3.0) * col("y") * col("n3") / col("n2"), lit(0.0)))
          .otherwise(lit(0.0)))
      .withColumn("d3",
        when(col("n3") > 0.0,
          greatest(lit(3.0) - lit(4.0) * col("y") * col("n4") / col("n3"), lit(0.0)))
          .otherwise(col("y")))
      // the continuation level keeps m138's single discount
      .withColumn("disc", col("y"))

    val d = col("disc")
    val pCont =
      greatest(coalesce(col("n1p_bwd").cast("double"), lit(0.0)) - d, lit(0.0)) / col("dd") +
        d * col("t") / col("dd") / col("v")
    val caD = col("ca").cast("double")
    val lam = (col("d1") * col("t1") + col("d2") * col("t2") +
      col("d3") * col("t3")) / caD
    val cD = coalesce(col("cab").cast("double"), lit(0.0))
    val dOfC = when(cD === 0.0, lit(0.0))
      .when(cD === 1.0, col("d1"))
      .when(cD === 2.0, col("d2"))
      .otherwise(col("d3"))
    val p = when(col("ca").isNotNull,
        greatest(cD - dOfC, lit(0.0)) / caD + lam * pCont)
      .otherwise(pCont)

    NgramLm.gramsOf(docs, textCol)
      .join(counts, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .join(cont, Seq("b"), "left")
      // empty model → empty scores, the scoreAgainst contract (above)
      .crossJoin(broadcast(glob.filter(col("dd") > 0.0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(log(p))).as("cross_entropy"))
      .withColumn("perplexity", exp(col("cross_entropy")))
  }

  /** Modified-KN self-perplexity — [[selfPerplexity]] under the KenLM
    * default discounts. */
  def modifiedSelfPerplexity(docs: DataFrame, textCol: String = "text",
                             minCount: Long = 1L): DataFrame =
    modifiedScoreAgainst(docs, NgramLm.bigramCounts(docs, textCol, minCount), textCol)

  /** Per-doc trigram stream (a, b, c) — the order-3 [[NgramLm.gramsOf]]:
    * one zip over three shifted slices, codegen projection, no window. */
  private[text] def trigramsOf(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(lower(trim(col(textCol))), " +")
    docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(zip_with(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          slice(col("t"), lit(2), size(col("t")) - 2),
          (a, b) => struct(a.as("a"), b.as("b"))),
        slice(col("t"), lit(3), size(col("t")) - 2),
        (ab, c) => struct(ab.getField("a").as("a"), ab.getField("b").as("b"), c.as("c"))))
        .as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("c").isNotNull)
  }

  /** Trigram count table (a, b, c, cabc) — the order-3 LM sufficient
    * statistic (minCount prunes the singleton tail at scale, the
    * bigramCounts convention). */
  def trigramCounts(docs: DataFrame, textCol: String = "text",
                    minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    trigramsOf(docs, textCol)
      .groupBy("a", "b", "c").agg(count(lit(1)).as("cabc"))
      .filter(col("cabc") >= minCount)
  }

  /** TRIGRAM interpolated Kneser–Ney (the order the public KenLM
    * configurations actually start at; Chen & Goodman 1998's recursion,
    * one level above [[scoreAgainst]]):
    *   p(c|ab) = max(c(abc) − D₃, 0)/c(ab·) + λ(ab)·p₂(c|b)
    * where the LOWER order runs on CONTINUATION counts — c'(bc) =
    * N1+(·bc) = |{a : c(abc) > 0}| — and p₂ is EXACTLY the [[scoreAgainst]]
    * bigram construction over that c' table (its own discount D₂ from
    * c''s counts-of-counts, continuation-count unigram level, uniform
    * 1/V termination). Each level's interpolation weight redistributes
    * exactly the mass its discount removed, so Σ_c p(c|ab) = 1 per seen
    * context (spec-pinned). Backoff ladder: unseen (a,b) context →
    * p₂(c|b) outright; unseen b → the continuation unigram; OOV → the
    * uniform leak. Empty model → empty scores (the dd > 0 contract).
    *
    * Scale shape: the corpus is touched twice (trigram count + score,
    * the m43 convention); EVERY lower-order statistic — c', both
    * context-mass tables, all N1+ tables, both discounts, T, V — is a
    * re-aggregation of the trigram COUNT table, never of text; the two
    * scalar frames ride one broadcast row; score joins left to AQE. */
  def trigramScoreAgainst(docs: DataFrame, counts3: DataFrame,
                          textCol: String = "text"): DataFrame = {
    // order-3 statistics
    val ctx3 = counts3.groupBy("a", "b")
      .agg(sum("cabc").as("cab"), count(lit(1)).as("nf3"))
    // continuation-count bigram table c'(bc) = N1+(·bc)
    val cp = counts3.groupBy("b", "c").agg(count(lit(1)).cast("long").as("cbc"))
    val ctx2 = cp.groupBy("b").agg(sum("cbc").as("cb"), count(lit(1)).as("nf2"))
    val cont2 = cp.groupBy("c").agg(count(lit(1)).as("nb2"))
    val vocab = counts3
      .select(explode(array(col("a"), col("b"), col("c"))).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("v"))
    val glob = counts3.agg(
        sum(when(col("cabc") === 1L, 1L).otherwise(0L)).cast("double").as("n1_3"),
        sum(when(col("cabc") === 2L, 1L).otherwise(0L)).cast("double").as("n2_3"))
      .crossJoin(cp.agg(
        count(lit(1)).cast("double").as("dd2"),
        sum(when(col("cbc") === 1L, 1L).otherwise(0L)).cast("double").as("n1_2"),
        sum(when(col("cbc") === 2L, 1L).otherwise(0L)).cast("double").as("n2_2"),
        countDistinct(col("c")).cast("double").as("t2")))
      .crossJoin(vocab)
      .withColumn("d3",
        when(col("n1_3") + lit(2.0) * col("n2_3") > 0.0,
          col("n1_3") / (col("n1_3") + lit(2.0) * col("n2_3"))).otherwise(lit(0.0)))
      .withColumn("d2",
        when(col("n1_2") + lit(2.0) * col("n2_2") > 0.0,
          col("n1_2") / (col("n1_2") + lit(2.0) * col("n2_2"))).otherwise(lit(0.0)))

    val d3 = col("d3"); val d2 = col("d2")
    // unigram continuation level over c' (the m138 construction)
    val pc =
      greatest(coalesce(col("nb2").cast("double"), lit(0.0)) - d2, lit(0.0)) / col("dd2") +
        d2 * col("t2") / col("dd2") / col("v")
    // bigram level over c' — seen b interpolates, unseen b IS pc
    val cbD = col("cb").cast("double")
    val p2 = when(col("cb").isNotNull,
        greatest(coalesce(col("cbc").cast("double"), lit(0.0)) - d2, lit(0.0)) / cbD +
          d2 * col("nf2").cast("double") / cbD * pc)
      .otherwise(pc)
    // trigram level — seen (a,b) interpolates, unseen context IS p2
    val cabD = col("cab").cast("double")
    val p3 = when(col("cab").isNotNull,
        greatest(coalesce(col("cabc").cast("double"), lit(0.0)) - d3, lit(0.0)) / cabD +
          d3 * col("nf3").cast("double") / cabD * p2)
      .otherwise(p2)

    trigramsOf(docs, textCol)
      .join(counts3, Seq("a", "b", "c"), "left")
      .join(ctx3, Seq("a", "b"), "left")
      .join(cp, Seq("b", "c"), "left")
      .join(ctx2, Seq("b"), "left")
      .join(cont2, Seq("c"), "left")
      // empty model → empty scores, the scoreAgainst contract
      .crossJoin(broadcast(glob.filter(col("dd2") > 0.0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        (-avg(log(p3))).as("cross_entropy"))
      .withColumn("perplexity", exp(col("cross_entropy")))
  }

  /** Trigram-KN self-perplexity — the order-3 no-external-LM gate.
    * Docs with < 3 tokens have no trigrams and are absent. */
  def trigramSelfPerplexity(docs: DataFrame, textCol: String = "text",
                            minCount: Long = 1L): DataFrame =
    trigramScoreAgainst(docs, trigramCounts(docs, textCol, minCount), textCol)
}
