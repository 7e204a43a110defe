package graft.ext

import graft.SparkSpec

/** Plan pins for the round-7 session-3 operators: none of them may plan
  * a CartesianProduct, and none except the documented 1-row scalar
  * cross joins (token burstiness' corpus-size factor, the A/B variant
  * pair) may plan a BroadcastNestedLoopJoin. Guards against a future
  * refactor silently turning an equi-join into an all-pairs plan —
  * the difference between one shuffle and an O(n²) job at 100 TB. */
class SessionOpsPlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // scalar cross joins (1-row or S-row side by construction: corpus
  // totals, the chi-square scalar, the variant pair, stratum totals)
  // are fine; a true cartesian between data-sized relations never is.
  // ext_kendall_tau's non-equi join is cell×cell over the contingency
  // GRID (≤ |hours|·|buckets| rows by construction), not over rows.
  private val scalarCrossOk = Set("ext_token_burstiness", "ext_ab_test",
    "ext_kruskal_wallis", "ext_kendall_tau", "ext_retrieval_eval",
    "ext_lift_gains", "ext_woe_iv", "ext_l_diversity", "ext_runs_test",
    "ext_lorenz", "ext_cramers_v", "ext_odds_ratio", "ext_attribution",
    "ext_cuped", "ext_did", "ext_mmr", "ext_assoc_rules", "ext_bfs", "ext_gini_stump",
    "ext_knn_eval", "ext_silhouette", "ext_nelson_aalen", "ext_logrank", "ext_brier",
    "ext_benford", "ext_js_divergence", "ext_stickiness", "ext_sparse_cosine",
    "ext_degree_dist", "ext_chi2_homogeneity", "ext_conductance",
    "ext_probe_calibration", "ext_kaplan_meier", "ext_jackknife", "ext_rbo",
    "ext_session_gap_curve", "ext_k_anonymity", "ext_anova_f",
    "ext_type_hour_mi", "ext_isotropy", "ext_wasserstein", "ext_tail_index",
    "ext_bm25_sweep", "ext_boilerplate_tokens",
    // bcubed's 1-row corpus-total cross; dunn's bounded a<b pair join;
    // ari/nmi cross scalar 1-row aggregates; t-closeness' m-bounded
    // sensitive-domain grid; qld's 1-row collection-stats cross
    "ext_bcubed", "ext_dunn", "ext_cluster_ari", "ext_cluster_nmi",
    "ext_t_closeness", "ext_qld",
    // Brown–Forsythe's 1-row totals/fold crosses (the anovaF shape);
    // CH/DB's k-row centroid crosses and 1-row DB rider
    "ext_brown_forsythe", "ext_calinski", "ext_davies_bouldin",
    "ext_vmeasure", "ext_dist_distances", "ext_err",
    // energy distance / CvM: 1-row totals cross
    "ext_energy_distance", "ext_cvm", "ext_token_dispersion",
    "ext_keyness", "ext_bootstrap_ci",
    // effect sizes: G×G bounded group-pair cross
    "ext_effect_sizes")

  private val ops = Seq(
    "ext_readability", "ext_lexical_diversity", "ext_benford", "ext_cusum",
    "ext_autocorr", "ext_phrase_search", "ext_clustering_coef",
    "ext_ppl_buckets", "ext_iqr_outliers", "ext_ab_test", "ext_control_chart",
    "ext_markov_stationary", "ext_js_divergence", "ext_token_burstiness",
    "ext_source_lang_mix", "ext_hourly_entropy", "ext_peaks",
    "ext_stickiness", "ext_seasonal_naive", "ext_sparse_cosine",
    "ext_degree_dist", "ext_assortativity", "ext_chi2_homogeneity",
    "ext_conductance", "ext_probe_calibration", "ext_hash_features",
    "ext_kaplan_meier", "ext_jackknife", "ext_rbo",
    "ext_path_surprisal", "ext_session_gap_curve", "ext_k_anonymity",
    "ext_multimodal_dedup", "ext_anova_f", "ext_type_hour_mi", "ext_isotropy",
    "ext_wasserstein", "ext_tail_index", "ext_json_field_stats",
    "ext_circular_hour", "ext_bm25_sweep", "ext_char_census",
    "ext_boilerplate_tokens", "ext_user_entropy",
    "ext_weekly_share_drift", "ext_new_vs_returning",
    "ext_spearman", "ext_mann_whitney", "ext_kruskal_wallis",
    "ext_kendall_tau", "ext_retrieval_eval", "ext_adamic_adar",
    "ext_lift_gains", "ext_target_encoding", "ext_woe_iv",
    "ext_l_diversity", "ext_dp_counts", "ext_holt", "ext_runs_test",
    "ext_lorenz", "ext_cramers_v", "ext_odds_ratio", "ext_attribution",
    "ext_cuped", "ext_did", "ext_mmr", "ext_assoc_rules", "ext_bfs", "ext_gini_stump",
    "ext_knn_eval", "ext_silhouette", "ext_hhi", "ext_kcore",
    "ext_textrank", "ext_attribution", "ext_ab_srm", "ext_cuped", "ext_did", "ext_mmr", "ext_assoc_rules", "ext_bfs", "ext_gini_stump",
    "ext_knn_eval", "ext_silhouette",
    "ext_mmr", "ext_weighted_quantile", "ext_seasonal_decompose",
    "ext_assoc_rules", "ext_bfs", "ext_probe_pr", "ext_chao1", "ext_cohort_ltv", "ext_gini_stump",
    "ext_knn_eval", "ext_silhouette", "ext_nelson_aalen", "ext_logrank",
    "ext_brier", "ext_bcubed", "ext_dunn", "ext_cluster_ari",
    "ext_cluster_nmi", "ext_durbin_watson", "ext_mann_kendall",
    "ext_jarque_bera", "ext_brown_forsythe", "ext_t_closeness", "ext_qld",
    "ext_closeness", "ext_approx_closeness",
    "ext_calinski", "ext_davies_bouldin", "ext_vmeasure",
    "ext_dist_distances", "ext_err", "ext_profile_cosine",
    "ext_corr_matrix", "ext_rouge", "ext_holt_winters",
    "ext_energy_distance", "ext_cvm", "ext_token_dispersion",
    "ext_keyness", "ext_bootstrap_ci", "ext_markov_attribution",
    "ext_effect_sizes")

  test("session-3 ops plan no cartesian products (and no BNLJ beyond scalar crosses)") {
    ops.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      if (!scalarCrossOk(q))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q plans a BroadcastNestedLoopJoin")
    }
  }
}
