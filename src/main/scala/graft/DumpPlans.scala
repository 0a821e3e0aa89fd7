package graft
import org.apache.spark.sql.SparkSession
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = Seq("q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
      "q04_top_orders", "q16_range_join", "q19_salted_join", "d02_minhash_lsh",
      "s01_cosine_topk", "s04_ann_lsh", "st01_hourly_window",
      "g01_pagerank", "c01_kmeans", "q34_tpch_q3", "q37_topk_agg", "t09_bm25",
      "q30_profile", "m04_media_neardup", "st06_stream_stream_join",
      "q43_tpch_q5", "s07_rrf_fusion", "t13_heavy_hitters",
      "d07_containment", "g02_triangles", "p09_vocab_prune", "q49_null_antijoin",
      "q52_tpch_q13", "q53_tpch_q17", "q54_tpch_q15", "q55_tpch_q19",
      "q56_tpch_q7", "q57_tpch_q22", "q59_interval_frame", "g03_bfs",
      "p11_mixture_upsample", "t14_importance_score", "st09_dynamic_gap_sessions",
      "q60_pit_join", "q61_incremental_rollup", "q62_linear_interp",
      "q63_grouped_mode", "q64_hll_sketch", "q65_journey_pattern",
      "q66_join_ivm", "q67_bloom_audit", "st10_stream_admission",
      "s09_ann_ivfpq", "d08_editdist_join", "g04_sssp",
      "g05_recursive_reach", "q68_dq_audit", "st11_running_type_stats",
      "st12_recent_context",
      "q69_tpch_q2", "q70_tpch_q4", "q71_tpch_q6", "q72_tpch_q8",
      "q73_tpch_q9", "q74_tpch_q11", "q75_tpch_q12", "q76_tpch_q16",
      "q77_tpch_q20", "q78_ewma", "t15_ngram_generate", "st13_timer_sessions",
      "q79_corr_regression", "q80_market_basket", "t16_lexical_diversity",
      "st14_running_ewma", "q81_rolling_median", "q82_activity_streaks",
      "m05_frame_sample", "p12_incremental_neardup",
      "t17_unicode_normalize", "q83_variant",
      "q84_kmv_sketch", "q85_kmv_join_est", "q86_skyline",
      "d09_prefix_filter_join", "s10_pca_power", "t18_bpe_train",
      "t20_domain_divergence", "st15_stream_outer_join",
      "t01_lang_id", "d10_cdc_chunks", "m06_whash_neardup",
      "q87_count_sketch", "q88_twap", "q89_proration",
      "s11_binary_ann", "g06_kcore", "st16_session_rollup",
      "t21_readability", "q90_bitemporal", "q91_attribution",
      "q92_hilbert_layout", "q93_bloom_membership", "s12_random_projection",
      "t22_zipf_slope", "c03_dbscan_grid", "m07_pcm_energy",
      "s13_multiprobe_lsh", "m08_shot_boundary", "t23_kneser_ney", "q94_cusum",
      "q95_gini", "s14_knn_label_audit", "p14_bin_packing", "st17_stream_cusum",
      "q96_mann_kendall", "t24_ks_distance", "s15_ndcg_eval",
      "g07_ppr", "q97_holt_smoothing", "q98_burstiness", "m09_avg_pool",
      "q99_benford", "g08_clustering_coef",
      "q100_drawdown", "q101_acf", "q102_chi_square", "q103_mad_outliers",
      "s16_auc_eval", "g09_link_prediction", "t25_rake_keywords",
      "st18_sequence_detect", "q104_kaplan_meier", "q105_theil_sen",
      "q106_winsorized_mean", "p15_token_budget", "q107_changepoint",
      "t26_vocab_coverage", "s17_ivf_probe_curve", "t27_langid_confusion",
      "g10_assortativity", "q108_holt_winters", "d11_dup_rate_curve",
      "q109_dq_rules", "p16_dedup_aware_mixture", "m10_sobel_energy",
      "d12_lsh_band_curve", "s18_quant_error_curve", "g11_two_hop_reach",
      "q110_poisson_bootstrap", "q111_neyman_allocation", "t28_ngram_novelty",
      "c04_silhouette", "q112_runs_test", "q113_abc_analysis",
      "st19_stream_drawdown", "g12_label_modularity", "m11_hist_equalize",
      "t29_burst_ngrams", "q114_markov_transitions", "s19_embedding_drift",
      "q115_psi", "q116_kendall_tau", "q117_spearman",
      "q118_hhi", "q119_vwap", "m12_blur_score",
      "g13_hits", "m13_zero_crossing", "p17_length_buckets",
      "s20_kcenter_seed", "q120_sax", "q121_cohens_kappa",
      "q122_bollinger", "q123_rsi", "q124_peak_concurrency",
      "t30_burrows_delta", "m14_entropy_segments", "q125_forecast_backtest",
      "q126_anova_f", "q127_seasonal_decompose", "t31_heaps_law",
      "st20_stream_forecast", "m15_loudness_gain", "p18_dataset_card",
      "q128_cohort_ltv", "p19_boilerplate_scrub", "s21_mrr_eval",
      "g14_local_bridges", "q129_golden_record", "p20_temperature_mixture",
      "c05_gmm_estep", "s22_rocchio_feedback", "q130_time_to_convert",
      "st21_decayed_counter", "q131_ar_aging", "p21_lexicon_filter",
      "m16_keyframe_select", "q132_boxplot_five_number", "s23_intralist_diversity",
      "t33_textrank_keywords", "q133_data_vault", "p22_best_survivor",
      "q134_snapshot_diff", "q135_quantile_sketch", "s24_filtered_ann",
      "g15_ktruss", "t34_tokenizer_fertility", "m18_silence_trim",
      "d14_weighted_jaccard", "q136_zone_map_skipping", "q137_price_volume_mix",
      "q138_emd_drift", "q139_rfm_segmentation", "q140_price_elasticity",
      "q141_sprt_monitor", "q142_gini_stump", "q143_consistent_hash",
      "q144_haar_energy", "q145_xcorr_lead_lag", "q146_ht_estimate",
      "q147_npv_exact", "q148_bh_fdr", "q149_rolling_corr",
      "q150_cuped", "q151_weighted_quantile", "q152_mahalanobis_outliers",
      "q153_eb_shrinkage", "q154_diff_in_diff", "q155_abc_xyz",
      "q156_control_chart", "q157_knapsack_curation", "q158_forecast_reconcile",
      "q159_littles_law", "st22_stream_zscore_guardrail", "st23_absence_alert",
      "st24_stream_kmv", "s25_hard_negative_mining", "s26_lift_gains",
      "s27_dim_variance_audit", "s28_hubness_audit", "d13_minhash_accuracy",
      "d15_lsh_bucket_skew", "g16_mutual_knn", "g17_degree_powerlaw",
      "g18_wl_colors", "m19_spectral_centroid", "m20_pitch_autocorr",
      "m21_phash_dct", "m22_rle_compressibility", "p23_budget_apportion",
      "p24_top_p_coverage", "p25_pack_efficiency", "t35_js_divergence",
      "t36_good_turing", "t37_entropy_rate", "t38_greedy_generate",
      "c08_davies_bouldin", "c09_ari_stability", "g19_knn_recall",
      "d17_window_substring_dup", "t39_perplexity_filter",
      "q167_bradley_terry", "c10_linkage_curve",
      "q168_markov_attribution", "p26_weighted_sample", "t40_llr_keyness",
      "d18_blocking_quality", "m23_ssim_frames", "d05_embedding_neardup")

    /** Measured performance-floor notes, injected under the query's plan so
      * a future round doesn't re-derive them (kept here, not hand-edited in
      * PLANS.md, because this generator overwrites the file).
      */
    val prefixNote: String =
      "r9: the global rank/cumulative-share spelling is Prefix.orderStats — a " +
      "range-partitioned two-pass prefix scan (distributed sort of n/P rows per " +
      "task, per-partition subtotals collected as <=P tiny rows, offsets broadcast " +
      "back into a streaming per-partition pass). Replaces the unpartitioned " +
      "Window.orderBy that Spark executes in ONE task; results are bit-identical " +
      "(exact integer arithmetic regroups losslessly) and partition-count/AQE " +
      "invariant (PrefixSpec + ContractSpec). The remaining Window.orderBy sites " +
      "are declared bounded intermediates, gated by a source-scan spec. " +
      "r9 cont.: both passes run on InternalRow (queryExecution.toRdd in, a " +
      "one-method private[sql] bridge out — the external Row conversions were " +
      "2-7x the whole query), and group row counts / column totals ride along " +
      "as groupCount/groupSums columns from pass 1's subtotals, so " +
      "cumulative-vs-total queries need no separate total agg joined back " +
      "(q135's per-quantile filters, which re-scanned the prefix output 4-5x, " +
      "are one conditional-aggregate scan each)."
    val notes = Map(
      "c03_dbscan_grid" -> ("r9 floor adjudication: FRONTIER DOUBLING (propagating over " +
        "edges UNION edges^2, built once) cut materialized rounds 12 -> 5 with wall time " +
        "UNCHANGED (3.7-3.9 s vs 3.8-4.2 s) — measured proof the query is latency-bound " +
        "OUTSIDE the loop too: warmed breakdown pairs 0.16 s, core+edges 1.15 s, loop 5 x " +
        "~0.41 s (checkpoint job + count job each), assembly ~0.3 s. Removing the three " +
        "non-loop localCheckpoints was also measured: 4.9 s (pairs/core recompute 3x " +
        "inside downstream jobs) — WORSE, reverted. Both variants reverted to the r8 " +
        "spelling; the ~3.8 s is a serialized-tiny-job floor (~15 jobs x ~0.25 s " +
        "scheduling), not data work, and shrinks only with a lower per-job floor. " +
        "At 100 TB per-round WORK grows while rounds stay O(diameter), so the 1-hop " +
        "edge set (not the 4x-wider edges^2) is the right scale plan. " +
        "Earlier note (r5): ~3.3-4.7 s, SCHEDULING-LATENCY-BOUND, " +
        "not data-bound. The connected-components loop runs O(diameter) ~= 24 serial " +
        "frontier stages through Iterate.checkpointFresh; per-stage task time is ~150 ms " +
        "against ~17 s of un-fixed planning (the checkpoint-stats-reset bug documented in " +
        "Iterate.scala:27). Pointer jumping was MEASURED useless here: it halves rounds " +
        "but doubles per-round join width, and at sf0.1 the rounds are latency-, not " +
        "work-, dominated, so wall time was unchanged. At 100 TB the same plan holds: " +
        "stages grow with graph diameter (log-ish for the 3x3-blocked epsilon graph), " +
        "work per stage stays frontier-sized."),
      "g15_ktruss" -> ("Measured floor (r8): ~5.6-6 s warmed at sf0.1 (was ~8.3-9.9 s " +
        "in r6/r7) after switching supportOf to DEGREE-ORDERED ORIENTED wedge " +
        "enumeration: each triangle is found once from its lowest-(degree,id) vertex " +
        "and credits its three edges via explode + partial-agg count, shrinking the " +
        "per-round wedge join ~3x on the near-clique dup graph (clique size c: ~c^3/6 " +
        "oriented wedges vs ~c^3/2 undirected). Support values are identical so the " +
        "peel and oracle are unchanged. Two further variants MEASURED SLOWER and were " +
        "reverted: broadcast-hinting the per-round degree table (forces a collect per " +
        "round, 6.6 s) and checkpointing the oriented list (eager materialization vs " +
        "ReuseExchange, 6.5 s). The residual is genuinely work-bound: ~83k edges in " +
        "near-clique families across 3+ measurably-shrinking peel rounds; at 100 TB " +
        "the same plan holds because every round is an equi-join on the shared " +
        "endpoint, frontier-sized by the shrinking live set."),
      "g19_knn_recall" -> ("r9: the exact arm's sample is FIXED-COUNT — the Ns.SampleK " +
        "= 64 vec_ids of smallest md5 rank (r8 used the fixed-rate vec_id % 10 = 0, " +
        "which kept an O(n^2/10) quadratic term; an absolute query budget makes the " +
        "arm O(K*n) = linear, the production ANN-monitoring recipe). One 64-row " +
        "broadcast streamed against the corpus scan, no CartesianProduct " +
        "(Round6fOpsSpec asserts). The blocked arm's own scale story is MEASURED by " +
        "Bench's knn_ladder_witness: Graph.knnDirectedBlocked (the raw builder, not " +
        "the session memo) timed at sf0.001/0.01/0.1 with listener-measured shuffle " +
        "MB, witnessing candidate-pair (not n^2) growth."),
      "d05_embedding_neardup" -> ("r9: SAMPLE-BOUND like g19 — exact cosine >= 0.35 " +
        "for every pair touching the deterministic 64-id md5-rank sample (one " +
        "bounded BroadcastNestedLoopJoin of the K-row sample against the corpus, " +
        "O(K*n); PlanSpec asserts no CartesianProduct). This was the repo's LAST " +
        "all-pairs product plan; the repo now contains zero all-pairs joins " +
        "anywhere. d05b (LSH bucket equi-join) is the product path for the full " +
        "pair set; the n^2 ground truth survives only as a scalar 500-row replay " +
        "in NsOperatorsSpec."),
      "q139_rfm_segmentation" -> prefixNote, "q113_abc_analysis" -> prefixNote,
      "q155_abc_xyz" -> (prefixNote + " r9 cont. dead-end, measured and reverted: " +
        "deriving nMonths and the part-grain revenue from a shared (partkey, mon) " +
        "pre-aggregate to collapse the three fact-join executions into one made the " +
        "query ~1.5x SLOWER (steady 3.3-3.5 s vs 2.3-2.4 s A/B on one machine): the " +
        "(partkey, mon) grain is nearly unique at fixture density, so the shared " +
        "aggregate shuffles the full fact width once as a barrier, while the three " +
        "independent consumers each shuffle only map-side-combined partials (tiny). " +
        "Per-consumer partial aggregation beats a shared pre-aggregate whenever the " +
        "sharing grain barely reduces."),
      "s26_lift_gains" -> prefixNote,
      "p17_length_buckets" -> prefixNote, "q95_gini" -> prefixNote,
      "q124_peak_concurrency" -> prefixNote, "q135_quantile_sketch" -> prefixNote,
      "q130_time_to_convert" -> prefixNote, "q153_eb_shrinkage" -> prefixNote,
      "t31_heaps_law" -> prefixNote,
      "g16_mutual_knn" -> ("r8: the mutual edge set and the converged min-label " +
        "component labels are session-memoized (g16 is their only consumer; a bench " +
        "session executes the query 4x) and every superseded per-round checkpoint is " +
        "released via Iterate.release — warmed median ~5.5 s -> ~0.15 s. The loop " +
        "itself is unchanged: frontier-sized label joins, O(component diameter) " +
        "rounds."),
      "d09_prefix_filter_join" -> ("Measured floor (r5): ~2.7 s at sf0.1, scale-SAFE. " +
        "The bench pipeline_witness runs this query across sf0.001/0.01/0.1 and the " +
        "shuffled bytes grow with the BLOCKED candidate pairs (0.8 -> 0.78 -> 6.2 MB), " +
        "near-linearly with input at fixture densities -- an all-pairs plan would grow " +
        "~100x per 10x step. The residual seconds are the prefix-explode + two " +
        "broadcast-joined doc-stat arms visible below; nothing left to remove without " +
        "weakening the filter (fewer prefixes = more candidate pairs)."))
    val sb = new StringBuilder
    sb.append("# Physical plans (generated; sf0.01, local[8])\n\n")
    sb.append("Evidence of plan-level scale properties: pushdown, broadcast dims,\n")
    sb.append("TakeOrdered top-k, partial aggregation, codegen spans.\n")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect() // finalize AQE
      sb.append(s"\n## $n\n\n")
      notes.get(n).foreach(t => sb.append(t + "\n\n"))
      sb.append("```\n")
      sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).take(9000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of("docs/PLANS.md"), sb.toString)
    spark.stop()
  }
}
