package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: the repo's determinism story (portable
  * hashes, exact integer money, explicit tie-breaks, ordered listagg)
  * claims every declared result is a pure function of the DATA, not of
  * the cluster shape. This spec runs hash-sensitive queries under two
  * different shuffle-partition counts — the thing that changes when a
  * 100 TB job is retried on a different-sized cluster — and requires
  * bit-identical results. A query that flaps here would pass the
  * DuckDB gate today and corrupt a production rerun tomorrow.
  */
class DeterminismSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  // one representative per operator family — hash-sensitive queries
  // (sampling, splits, dedup keepers, sketches, string agg, heap
  // top-k, composed curation) plus the relational / event-time /
  // similarity / layout / data-quality cores
  private val sensitive = Seq(
    // hash-sensitive core
    "q59_hash_sample", "q60_stratified_sample", "q105_split_manifest",
    "q35_exact_dedup", "q43_kmv_distinct", "q112_cms_heavyhitters",
    "q110_topk_heap", "q121_listagg", "q118_curation_e2e",
    // relational: agg, join, window, top-k, set ops, lateral
    "q01_pricing_summary", "q05_local_supplier_volume",
    "q09_window_topk_per_group", "q14_set_ops", "q15_topk_global",
    "q115_lateral_topk",
    // event-time: windows, sessions, as-of, funnel, Markov
    "q23_tumbling_window", "q25_session_window", "q29_asof_join",
    "q81_funnel", "q99_markov_transitions",
    // text / fingerprints / sketches
    "q33_bag_fingerprint", "q37_simhash_buckets", "q44_rolling_fingerprint",
    "q70_bigram_lm", "q83_table_checksum",
    // similarity (quantized cosine, LSH, centroids)
    "q40_cosine_topk", "q53_ann_signlsh", "q75_centroid_central",
    // quantiles / stats
    "q57_percentile_stats", "q80_hist_quantile", "q100_robust_stats",
    // layout / data-quality / reconciliation
    "q87_zorder_stats", "q113_profile", "q117_skew_stats",
    "q119_bloom_prune", "q122_table_diff", "q124_vocab_rank",
    "q125_drift_detect", "q126_integrity_audit", "q129_equidepth_hist",
    "q130_ngram_novelty", "q131_vocab_coverage", "q132_source_novelty",
    "q133_binary_ingest", "q134_ngram_jaccard", "q135_mixture_execute",
    "q136_simhash_hamming", "q137_embedding_moments", "q138_graph_triangles",
    "q139_pq_encode", "q140_pq_adc_topk", "q141_ann_ivf_multiprobe",
    "q142_ann_recall", "q143_source_overlap", "q144_ks_drift",
    "q145_pagerank", "q146_item_similarity", "q147_dup_regions",
    "q148_degree_assortativity", "q149_k_anonymity",
    "q150_link_prediction", "q151_compaction_plan",
    "q152_containment_join", "q153_kmv_set_ops", "q154_weighted_sample",
    "q155_incremental_neardup", "q156_deletion_audit",
    "q157_kmv_overlap_audit", "q158_trimmed_mean",
    "q159_cooc_substrate_reuse", "q160_linkpred_cap_audit",
    // round 10: fixpoint-iterated graph ops, acceptance sweeps,
    // contrastive mining, incremental substrate merge, as-of tolerance
    "q161_personalized_pagerank", "q162_weighted_pagerank",
    "q163_ann_nprobe_tune", "q164_label_propagation",
    "q165_ann_lshbits_tune", "q166_contrastive_pairs",
    "q167_l_diversity", "q168_cooc_incremental", "q169_asof_tolerance",
    "q172_frequent_triples", "q173_session_metrics", "q174_archive_ingest",
    "q175_ann_kmeans_ivf", "q176_peak_concurrency",
    "q177_record_linkage", "q178_ols_trend", "q179_zonemap_prune",
    "q180_kfold", "q181_autocorr", "q182_fd_audit",
    "q183_seasonal_profile", "q184_filter_agreement",
    "q185_token_apportionment", "q186_cuped", "q187_watermark_audit",
    "q188_seasonal_backtest", "q189_gazetteer_mentions",
    "q190_bm25_topk", "q191_kcore", "q192_rrf_fusion",
    "q193_vocab_growth", "q194_kaplan_meier", "q195_bfs_hops",
    "q196_lexical_diversity", "q197_salt_derived",
    "q198_ivf_incremental", "q199_graph_epoch_churn",
    "q200_feature_bin_lift", "q201_cusum_drift", "q202_benford_audit",
    "q203_modularity", "q204_session_gap_audit",
    "q205_conversion_latency",
    // round 11: rank statistics, contingency audit, bit-log regression,
    // iterative bipartite fixpoint, cell-bounded semantic dedup
    "q206_gini_concentration", "q207_rfm_segments",
    "q208_mannwhitney_u", "q209_chi2_independence", "q210_zipf_slope",
    "q211_embedding_norm_audit", "q212_hits", "q213_semdedup_sweep",
    "q214_hll_distinct", "q215_dsir_importance", "q216_blocking_audit",
    "q217_weighted_median", "q218_dsir_mixture",
    "q219_degree_distribution", "q220_pca_power",
    "q221_budget_selection", "q222_markov_stationary",
    "q223_holt_smoothing", "q224_quantile_normalize",
    "q225_brand_homophily", "q227_abc_classification",
    "q228_markov_backtest", "q229_mixture_reconciliation",
    "q230_ship_latency_sla", "q231_hapax_rate",
    // round 12: band-decomposed total ranks (within-band row_number on
    // doc_id), basis-point shares, daily-grid dispersion
    "q232_spearman_length_dup", "q233_hhi_concentration",
    "q234_dispersion_index", "q235_katz_centrality",
    "q236_t_closeness",
    // round 13 (ADVICE r12): the tie-break-dependent additions —
    // q237's earliest-day changepoint pick, q242's hash-ordered 8-seed
    // selection, q243's top-5 per-source tie-break — plus the rest of
    // the r12 statistics pack
    "q237_pettitt_changepoint", "q238_vocab_overlap",
    "q239_logrank_priority", "q240_ols_latency_multi",
    "q241_trend_test", "q242_harmonic_centrality",
    "q243_tfidf_keywords", "q244_repetition_audit",
    "q245_conformal_latency", "q247_theilsen_trend",
    // round 13: the BPE training loop's per-step argmax tie-break,
    // unreduced-fraction TVD, hazard prefix sums, band-index blocking,
    // dominance-window concordance
    "q248_bpe_merge_loop", "q249_unigram_tvd", "q251_nelson_aalen",
    "q252_phash_blocking", "q254_goodman_kruskal_gamma",
    "q255_kruskal_wallis", "q256_dow_eta_squared",
    "q257_minhash_jaccard_audit", "q258_interarrival_cv2",
    "q259_term_burst", "q261_leadlag_r2",
    "q262_manifest_overlap_sweep", "q263_ktruss_peel",
    "q264_eb_shrunk_rates", "q265_late_quarantine",
    "q266_graph_summary", "q267_rich_club", "q269_skyline_2d",
    // round 14: struct-key first-purchase tie-break, derived-midpoint
    // DiD cells, Good-Turing tallies
    "q268_channel_removal", "q270_diff_in_diff", "q271_good_turing",
    "q272_hll_sliding", "q273_char_surprise", "q274_mmr_retrieval",
    "q275_hard_pairs", "q276_eb_holdout_audit",
    "q277_isotonic_calibration", "q279_source_ablation",
    "q280_qi_pair_risk", "q281_decayed_engagement", "q282_double_sweep",
    "q283_dedup_savings",
    // round 15: rerank tie-breaks over the candidate set, the LRS
    // binary-search ladder's lexicographic pick, the bootstrap's
    // replicate order statistics, the CountSketch median order
    // statistics, the IPS policy argmax tie-break
    "q284_bm25_rerank", "q285_suffix_lrs", "q286_poisson_bootstrap",
    "q287_countsketch_audit", "q288_ips_policy_eval",
    // batch B: hash-derived bigram tallies, hash-seeded mask spans,
    // hash-seeded permutation relabelings — all must be invariant to
    // the shuffle shape by construction
    "q289_chao1_richness", "q290_span_corruption",
    "q291_permutation_test",
    // batch C: the KN top-20 tie-break, the Shapley suffix scan's
    // distance-rank tie-break, McNemar's hash-flip replicates
    "q292_kneser_ney", "q293_knn_shapley", "q294_mcnemar_filters",
    // batch D: greedy argmax tie-breaks, band-blocked candidate sets,
    // CC label propagation, CMH fixed-point floors
    "q295_coverage_greedy", "q296_dbscan_lsh", "q297_cmh_stratified",
    // batch E: rank tie-breaks in the retrieval window, the top-8
    // coefficient cut, ntile bucketing, struct-min motif neighbors
    "q298_retrieval_metrics", "q299_haar_sketch", "q300_sax_motifs",
    // batch F: PCM window energies, prefix-sum EMD grids, BH step-up
    // rank tie-breaks over hash-seeded p-values
    "q301_audio_vad", "q302_wasserstein_drift", "q303_bh_fdr",
    // batch G: windowed sequence supports, the DP's split argmin,
    // fixed-bin calibration floors
    "q304_seq_patterns", "q305_vopt_histogram", "q306_ece_calibration",
    // batch H: rank-prefix agreement grids, argmax-over-nodes
    // assignments, bucketed estimate floors
    "q307_rbo_rankings", "q308_rendezvous_rebalance",
    "q309_join_card_audit",
    // batch I: re-randomization counts, per-size Bloom position sets
    "q310_srm_check", "q311_bloom_size_tune",
    // round 16: the priority-sample top-21 cut and τ threshold, the
    // Brandes per-level σ/δ floors and top-25 cut, the curve-rank
    // gaps-and-islands run counts
    "q312_priority_sample", "q313_betweenness_sampled",
    "q314_hilbert_layout",
    // round 16 batch B: the prefix-cosine rank tie-breaks, the sampled
    // zone boundaries (hash sample + rank cut), the hashed-gram
    // per-occurrence overlap counts
    "q315_matryoshka_recall", "q316_sortkey_advisor",
    "q317_contamination_check",
    // round 16 batch C: hash-coin flips, integer ceils over the lift
    // grid, hash-chosen CDC update/delete sets
    "q318_rr_privacy_audit", "q319_power_sizing",
    "q320_ivm_retraction_audit",
    // round 16 batch D: the ±1-corrected isqrt weights, the best-group
    // impact ratio floor
    "q321_neyman_allocation", "q322_filter_parity_audit",
    // round 16 batch E: the smallest-threshold-at-max-F1 tie-break,
    // the band-located rank selections
    "q323_threshold_selection", "q324_median_ci_aa",
    // round 16 batch F: the isqrt mixture weights
    "q325_temperature_mixture",
    // round 16 batch G: the farthest-point argmax tie-break, the
    // 4-seed relaxation min-folds, the millibit-LUT log terms, the
    // per-depth rank tie-breaks
    "q326_kcenter_coreset", "q327_weighted_sssp", "q328_psi_drift",
    "q329_quant_depth_audit",
    // round 16 batch H: the day-ordered LLR cumulative fold, the
    // word-graph fixpoint + top-15 tie-break, the q-digest fold +
    // walk tie-breaks and banded exact rank selects
    "q330_sprt_monitor", "q331_textrank_keyphrases",
    "q332_qdigest_quantiles",
    // round 16 batch I: the struct-min first purchase, path-position
    // ppm floors, NULL-bucket union; the millibit entropies + argmax
    // tie-break; the per-shard digest folds and merge recompress
    "q333_ushape_attribution", "q334_split_gain_audit",
    "q335_qdigest_merge_audit",
    // round 16 batch J: the centroid-argmax cell assignment feeding
    // the exact ARI combinatorics; the mergeable power-sum moments
    "q336_ari_clusterings", "q337_shape_profile",
    // the trained-merge application join + per-lang fertility floors
    "q338_bpe_fertility",
    // round 17: the cut-list chain — struct-min keeper tie-break,
    // hash-candidate + exact-verify grouping, doc-local islands, and
    // the word-offset running sum feeding the containment join
    "q339_dedup_cutlist", "q340_dedup_reclaimed",
    // round 18: the keeper-attributed cut positions under the
    // source-pair rollup (struct-min keeper tie-break inherited);
    // the OBF interim fold's cumulative window + DECIMAL z²; the
    // Bradley–Terry BigInt MM fold over the collected win matrix
    "q354_dedup_attribution", "q355_obf_boundaries",
    // the LPA-label boundary fold (min tie-breaks inherited from q164)
    "q356_bradley_terry", "q357_conductance_audit",
    // the centroid-argmax assignment feeding per-cell moment
    // summaries and the shifted signed silhouette division
    "q341_silhouette",
    // readability floors; the hash-seeded ±1 projection signs and
    // HUGEINT ratios; the char-histogram LUT entropy fold
    "q342_readability_lix", "q343_jl_projection_audit",
    "q344_byte_entropy",
    // the banded-caliper struct-min match and the gap-window γ-costs
    "q345_psm_att", "q346_postings_compression",
    // struct-min firsts + hour-band rank locates
    "q347_time_to_convert",
    // per-column size models; the shared Gram power trajectory +
    // BigInt Rayleigh fold
    "q348_dict_encoding_estimate", "q350_isotropy_audit",
    // the two-level run decomposition's windows and struct tie-breaks
    "q351_clustering_factor",
    // the Expand-based rollup grains; the median signing + run fold;
    // the isqrt Wilson radicals
    "q352_revenue_rollup", "q353_runs_test", "q349_wilson_ci")

  // multiset compare (row -> multiplicity), not Set: a query whose
  // duplicate-row multiplicity varied with the shuffle-partition count
  // would falsely pass a Set comparison
  private def runAll(parts: Int): Map[String, Map[String, Int]] = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"determinism-$parts")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try sensitive.map { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val cols = df.columns.sorted.toSeq
      q -> df.selectExpr(cols: _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
        .groupBy(identity).map { case (row, rs) => row -> rs.size }
    }.toMap
    finally spark.stop() // fresh session per shape: configs are session-bound
  }

  test("hash-sensitive queries are invariant to shuffle partition count") {
    val a = runAll(3)
    val b = runAll(11)
    for (q <- sensitive) {
      val diff = (a(q).keySet ++ b(q).keySet)
        .filter(k => a(q).getOrElse(k, 0) != b(q).getOrElse(k, 0))
      assert(diff.isEmpty,
        s"$q changed under repartition: ${diff.take(3).map(k =>
          s"$k (x${a(q).getOrElse(k, 0)} vs x${b(q).getOrElse(k, 0)})")}")
    }
  }
}
