package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Empty-input robustness: at 100 TB a daily partition with zero rows is
  * routine (S2 pins the source-level guard; this pins the OPERATOR
  * level). Every query here must return an EMPTY result on an empty
  * corpus — not throw. The fixture replicates the driver tables'
  * schemas exactly, with zero rows. */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = s"/tmp/graft-empty-fixture-${ProcessHandle.current().pid()}"
    val s = spark
    def writeEmpty(name: String, ddl: String): Unit =
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    writeEmpty("documents",
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    writeEmpty("embeddings",
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    dir
  }

  private val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "m01_text_stats" -> (CorpusQueries.textStats _),
    "m03_exact_dedup_groups" -> (CorpusQueries.exactDedupGroups _),
    "m05_minhash_pairs" -> (CorpusQueries.minhashPairs _),
    "m14_gram_index_jaccard" -> (CorpusQueries.gramIndexJaccard _),
    // m113: empty corpus → empty postings → no pairs
    "m113_containment_pairs" -> (CorpusQueries.containmentPairs _),
    "m17_dedup_clusters" -> (CorpusQueries.dedupClusters _),
    "m52_curriculum_shards" -> (CorpusQueries.curriculumShards _),
    "m71_compression_ratio" -> (CorpusQueries.compressionRatios _),
    "m73_source_interleave" -> (CorpusQueries.sourceInterleave _),
    "m76_char_entropy" -> (CorpusQueries.charEntropy _),
    "m79_tokenizer_fertility" -> (CorpusQueries.tokenizerFertility _),
    "m82_span_scrub" -> (CorpusQueries.spanScrub _),
    // m83: training degrades to the zero model, scoring to an empty frame
    "m83_quality_classifier" -> (CorpusQueries.qualityClassifier _),
    "m85_lsh_recall" -> (CorpusQueries.lshRecallAudit _),
    "m88_token_coverage" -> (CorpusQueries.tokenCoverage _),
    "m89_ppl_buckets" -> (CorpusQueries.pplBuckets _),
    "m90_decontaminate_spans" -> (CorpusQueries.decontaminateSpans _),
    "m91_gopher_rules" -> (CorpusQueries.gopherRules _),
    "m92_gopher_line_rules" -> (CorpusQueries.gopherLineRules _),
    "m93_repetition_rules" -> (CorpusQueries.repetitionRules _),
    "m94_c4_rules" -> (CorpusQueries.c4Rules _),
    // m95: both bucket distributions and the percentile threshold degrade
    // to empty/null; the scored frame must come back empty, not divide by
    // an empty total
    "m95_dsir_weights" -> (CorpusQueries.dsirWeights _),
    "m96_keep_first_lines" -> (CorpusQueries.keepFirstLineDedup _),
    "m97_keep_first_spans" -> (CorpusQueries.keepFirstSpans _),
    "m98_calibration" -> (CorpusQueries.calibration _),
    "m99_lsh_precision" -> (CorpusQueries.lshPrecisionAudit _),
    "m100_unimax_mix" -> (CorpusQueries.unimaxMix _),
    // m110: zero sources → empty sizes table → empty mix card
    "m110_alpha_mix_weights" -> (CorpusQueries.alphaMixWeights _),
    // m114: empty corpus → empty top-(k+1) frame; the 1-row τ aggregate
    // (coalesced to 0) must cross-join to nothing, not invent a row
    "m114_priority_sample" -> (CorpusQueries.prioritySample _),
    // m115: zero strata → empty stats frame; the 1-row null denominator
    // cross-joins to nothing
    "m115_neyman_alloc" -> (CorpusQueries.neymanAlloc _),
    // m116: empty corpus → empty pinned count table → empty vocabulary,
    // null totals; the final per-source aggregate is over zero rows
    "m116_bounded_kl_drift" -> (CorpusQueries.boundedKlDrift _),
    // m117: empty corpus → empty LM → empty domain pools; the 1-row
    // null totals and null MW normalizer cross-join to nothing
    "m117_doremi_weights" -> (CorpusQueries.doremiWeights _),
    // m118: empty corpus → empty votes; the 1-row zero-count stats
    // broadcast joins onto zero rows
    "m118_dawid_skene" -> (CorpusQueries.dawidSkene _),
    // m119: empty embeddings → empty pinned summary → empty card
    "m119_centroid_drift" -> (CorpusQueries.centroidDrift _),
    // m120: empty corpus → no images → no signatures → no pairs
    "m120_image_neardups" -> (CorpusQueries.imageNearDups _),
    // m121: empty corpus → empty windows → empty calibration
    "m121_quality_percentiles" -> (CorpusQueries.qualityPercentiles _),
    // m122: empty embeddings → empty pinned dots → empty margins
    "m122_label_noise" -> (CorpusQueries.labelNoiseMargins _),
    // m123: empty corpus → empty token table → empty top-100
    "m123_token_burstiness" -> (CorpusQueries.tokenBurstiness _),
    // m124: empty reference LM + empty corpus grams → empty scores
    "m124_cross_perplexity" -> (CorpusQueries.crossPerplexity _),
    // m125: empty corpus → empty count table → empty card
    "m125_unseen_mass" -> (CorpusQueries.unseenMass _),
    // m126: empty corpus → empty bench and corpus gram sets → empty report
    "m126_benchmark_leakage" -> (CorpusQueries.benchmarkLeakage _),
    // m127: empty corpus → empty ranked frame → empty test card
    "m127_ks_drift" -> (CorpusQueries.ksDrift _),
    // m129: empty corpus → empty window stream → empty verdicts
    "m129_clean_holdout" -> (CorpusQueries.cleanHoldout _),
    // m130: empty corpus → no banded signatures → empty drop card
    "m130_lsh_bucket_drops" -> (CorpusQueries.lshBucketDrops _),
    // m131: empty corpus → no candidates → empty verify
    "m131_edit_similarity" -> (CorpusQueries.editSimilarityPairs _),
    // m132: empty corpus → no groups → empty quantile card
    "m132_source_quantiles" -> (CorpusQueries.sourceTokenQuantiles _),
    // m133: empty corpus → no suffix groups → no spans
    "m133_maximal_repeats" -> (CorpusQueries.maximalRepeats _),
    // m134: empty corpus → empty partials → empty ranked frame
    "m134_stratified_split_ranged" -> (CorpusQueries.stratifiedSplitRanged _),
    // m135: empty corpus → empty word table → empty model → empty stats
    "m135_unigram_tokens" -> (CorpusQueries.unigramTokens _),
    // m136: empty stats → empty per-source report
    "m136_unigram_fertility" -> (CorpusQueries.unigramFertility _),
    // m138/m142: empty count table → the 1-row discount/vocab aggregate
    // (all zeros) cross-joins onto zero gram rows — no division ever
    // evaluates per-row, so no NaN can surface
    "m138_kneser_ney" -> (CorpusQueries.kneserNeyPerplexity _),
    "m142_modified_kn" -> (CorpusQueries.modifiedKnPerplexity _),
    "m144_trigram_kn" -> (CorpusQueries.trigramKnPerplexity _),
    // m145: same contract through the modified D-ladder (empty stored
    // count asset → zero gram rows after the cross-join gate)
    "m145_modified_trigram_kn" -> (CorpusQueries.modifiedTrigramKnPerplexity _),
    // m139/m143: empty word table → alphabet-less model → zero docs to
    // encode; the fertility card aggregates over zero rows
    "m139_wordpiece_tokens" -> (CorpusQueries.wordPieceTokenStats _),
    "m143_wordpiece_fertility" -> (CorpusQueries.wordPieceFertility _),
    // m140: no shingles → no registers → no per-source estimate rows
    "m140_hll_cardinality" -> (CorpusQueries.hllCardinality _),
    // m148: the merged-ALL row is gated on registers_hit > 0, so the
    // global aggregate's one-row-on-empty artifact never surfaces
    "m148_hll_union" -> (CorpusQueries.hllUnionCard _),
    // m149: empty stream → empty counters → empty top-20 probe set
    "m149_cms_frequency" -> (CorpusQueries.cmsFrequencyCard _),
    // m150: empty range frame collapses build and estimate to zero rows
    "m150_histogram_quantiles" -> (CorpusQueries.histogramQuantileCard _),
    // m151: per-source grouping → zero groups → empty card
    "m151_sketch_source_quantiles" -> (CorpusQueries.sketchSourceQuantiles _),
    // m152: the global summary row is gated on n_grams > 0
    "m152_cms_prune_plan" -> ((s: SparkSession, d: String) => CorpusQueries.cmsPrunePlan(s, d)),
    // m155: null min-doc_id joins nothing → empty watchlist → empty card
    "m155_cms_frequency_prod" -> ((s: SparkSession, d: String) => CorpusQueries.cmsFrequencyProduction(s, d)),
    // m156: empty sketch collects to all-zero arrays; the summary row is
    // gated on n_pairs > 0
    "m156_cms_prune_prod" -> ((s: SparkSession, d: String) => CorpusQueries.cmsPruneProduction(s, d)),
    // m153: zero sources → zero sketches → zero pairs
    "m153_kmv_source_overlap" -> ((s: SparkSession, d: String) => CorpusQueries.kmvSourceOverlap(s, d)),
    // m154: the global fold row is gated on n_sources > 0
    "m154_kmv_union_card" -> ((s: SparkSession, d: String) => CorpusQueries.kmvCorpusUnionCard(s, d)),
    // m141: the augmentation filters on non-null text first → zero rows
    "m141_cc_luhn" -> (CorpusQueries.ccLuhn _),
    // m128: data-free design card — must still run (8 rows) on an empty
    // corpus; asserted separately below since "empty in = rows out" is
    // its CORRECT degradation
    // (handled in the dedicated non-empty-card test, not this roster)
    // m101: the single marginal row filters itself out at n = 0
    "m101_gate_agreement" -> (CorpusQueries.gateAgreement _),
    "m102_jl_projection" -> (CorpusQueries.jlNormCard _),
    // m103/m104: empty corpus → empty postings and empty query bags; the
    // one-row stats aggregate must not poison the empty scored frame
    "m103_bm25_topk" -> (CorpusQueries.bm25TopK _),
    // m112: empty postings asset + zero-doc stats row → empty probe
    "m112_bm25_stored" -> (CorpusQueries.bm25StoredProbe _),
    "m104_rrf_hybrid" -> (CorpusQueries.rrfHybrid _),
    // m105: the prefix-sum offset table degrades to [0]; no bucket rows
    "m105_novelty_curve" -> (CorpusQueries.noveltyCurve _),
    // m106/m107: empty corpus → empty family map → empty histogram/card
    "m106_dup_family_hist" -> (CorpusQueries.dupFamilyHistogram _),
    "m107_source_dup_mass" -> (CorpusQueries.sourceDupMass _),
    "m108_readability" -> (CorpusQueries.readability _),
    // m109: the mapPartitions union sweep over zero rows is zero rows
    "m109_repetition_union" -> (CorpusQueries.repetitionRulesUnion _),
    // m111: empty gram stream → empty summary → empty recount
    "m111_heavy_grams" -> (CorpusQueries.heavyGrams _),
    // ANN tier: quantizer training must degrade to an empty model, not
    // require a non-empty sample
    "m08_ann_brute" -> (CorpusQueries.annBruteForce _),
    "m12_ann_ivf" -> (CorpusQueries.annIvf _),
    "m33_semantic_dedup" -> (CorpusQueries.semanticDedup _)
  )

  queries.foreach { case (name, fn) =>
    test(s"$name returns empty, not an error, on an empty corpus") {
      fn(spark, emptyDir).count() shouldBe 0L
    }
  }

  test("m128_lsh_plan is data-free: the full design card even on an empty corpus") {
    // the planner is a pure function of (H, t) — an empty corpus must
    // still yield all 8 factorizations of the 128-hash budget
    CorpusQueries.lshPlan(spark, emptyDir).count() shouldBe 8L
  }
}
