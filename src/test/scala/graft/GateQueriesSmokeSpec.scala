package graft

/** Every gate query runs end-to-end at sf0.001 and returns rows.
  * (Value-level correctness is the driver's DuckDB oracle gate —
  * replayed locally via tools/verify_local.py.)
  */
class GateQueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Deliberate nested-loop joins: the definitionally brute-force KNN
    * baseline (scale paths: q_knn_lsh/ivf), and the SINGLE-ROW
    * broadcast joins (the dark frame; the histogram's (min,max) range
    * scalar; the curation gates' corpus-stats scalars) — a 1-row
    * build side is scale-safe at any corpus size. */
  private val NestedLoopAllowed =
    Set("q_knn_bruteforce", "q_dark_subtract", "q_histogram",
      "q_lm_perplexity", "q_lm_bigram", "q_lm_trigram", "q_dsir_weights",
      "q_dsir_select",
      "q_moore_lewis", // two OOV-floor single-row scalars (as q_lm_perplexity)
      "q_moore_lewis_bi", // same two OOV-floor single-row scalars, bigram rung
      "q_mix_rebalance", "q_edf_dark_radial", "q_curation_pipeline",
      "q_bm25", // (n_docs, total_len) single-row stats
      "q_ql_retrieval", // (ct) collection-total single-row stats (as q_bm25)
      "q_knn_pq", // exhaustive ADC scan (Jégou §IV); scale path = ivfPqTopK
      "q_ppl_buckets", // OOV scalar + (t1, t2) threshold single-row stats
      "q_zorder", // (min, max) grid-bounds single-row stats
      "q_pmi", // (N, M) corpus-totals single-row stats
      "q_lm_kn", // n1pp distinct-bigram-total single-row stats
      "q_contrastive_pairs", // exact-ranking baseline (same as q_knn_bruteforce)
      "q_flat_radial", // single-row dark-frame broadcast (as q_edf_dark_radial)
      "q_mix_temperature", // (total) and (w_sum) single-row stats scalars
      "q_kl_mix", // (n) corpus-token-total single-row scalar
      "q_embed_int8", // (mns, mxs) per-dim-bounds single-row broadcast
      "q_rfm", // (max_day) corpus-recency single-row scalar
      "q_w1_drift", // bounded source-list × value-grid broadcast product + (nc) scalar
    "q_ad_drift", // same bounded source-list × value-grid product as q_w1_drift
    "q_cuped", // (midpoint) and pooled-stats single-row scalars
    "q_kupiec_pof", // (midpoint) + in-sample VaR single-row scalars
    "q_bh_fdr", // (kmax) step-up threshold single-row scalar
    "q_decay_features", // (max xs) as-of-now reference single-row scalar
      "q_rrf_fusion", // (n_docs, total_len) single-row stats (same as q_bm25)
    "q_reliability", // (max n_chars) bucket-bound single-row scalar
    "q_kaplan_meier", // (max xs) censoring-horizon single-row scalar
    "q_logrank_strat", // same censoring-horizon scalar as q_kaplan_meier
    "q_aalen", // same censoring-horizon scalar as q_kaplan_meier
    "q_rmst", // same censoring-horizon scalar as q_kaplan_meier
    "q_cum_incidence", // same censoring-horizon scalar as q_kaplan_meier
    "q_turnbull", // same censoring-horizon scalar as q_kaplan_meier
    "q_nelson_aalen", // same censoring-horizon scalar as q_kaplan_meier
    "q_logrank", // same censoring-horizon scalar + (m1, m0) totals row
    "q_kendall", // calendar-bounded hourly-grid broadcast pair product (as q_w1_drift)
    "q_gk_gamma", // same hourly-grid broadcast pair product as q_kendall
    "q_somers_d", // same hourly-grid broadcast pair product as q_kendall
    "q_rbo", // composes q_bm25 + q_ql_retrieval single-row stats scalars
    "q_tfidf_terms", // (n_docs) corpus-total single-row scalar
    "q_ks_test", // (n1, n2) sample-size single-row scalar
    "q_cvm", // (n1, n2) sample-size single-row scalar (same as q_ks_test)
    "q_confusion", // (mean-length threshold) single-row scalar
    "q_brier", // (1+max n_chars) probability-scale single-row scalar
    "q_ece", // same (1+max) scalar as q_brier
    "q_cohen_kappa", // (mean chars, mean tokens) single-row scalar
    "q_minkpct", // OOV-floor single-row scalar (same as q_lm_perplexity)
    "q_mutual_info", // (1+max value, 1+max k) decile-bound scalar
    "q_dtw_align", // reference-series single-row broadcast (bounded by time grid)
    "q_matryoshka", // exact-ranking baseline (same as q_knn_bruteforce)
    "q_ann_recall_curve", // brute-force ground truth (same as q_knn_bruteforce)
    "q_kfold", // (corpus count) single-row scalar
    "q_negative_sampling", // (total weight) single-row scalar
    "q_quantile_norm", // pooled-grid × bounded source list (same as q_w1_drift)
    "q_label_prop", // (n_communities) single-row scalar
    "q_mmr_rerank", // brute-force pool scoring (same as q_knn_bruteforce)
    "q_assoc_rules", // (n_orders) corpus-total single-row scalar
    "q_kcore", // per-k (n_edges)⋈(n_nodes) 1-row summary join
    "q_ref_integrity", // five 1-row audit counters crossed into one row
    "q_tukey", // 8-row cohort-stats pair product (bounded by k², not data)
    "q_ess", // DSIR (nr, nt) corpus-totals single-row scalar (as q_dsir_weights)
    "q_bhattacharyya", // (ntot) corpus-token-total single-row scalar
    "q_eb_shrinkage", // (alpha, beta) method-of-moments prior single-row scalar
    "q_keyness", // (na, nb) group-total single-row scalar
    "q_davies_bouldin", // (n_clusters) k-bounded single-row scalar
    "q_dispersion", // bounded source-list × vocab grid product + (nt) scalar (as q_w1_drift)
    "q_burrows_delta", // bounded source-list × top-50 vocab grid product (as q_dispersion)
    "q_silhouette_sampled", // all-pairs INSIDE the hard m-row sample only (m² bounded)
    "q_itemsets3", // (n_baskets) corpus-total single-row scalar (as q_assoc_rules)
    "q_scan_stat", // (ct, th) corpus-totals + argmax single-row scalars
    "q_krippendorff", // pooled-marginals (n, nv2) single-row scalar
    "q_gini_split", // (min impurity) argmin single-row scalar
    "q_youden", // (max gap) argmax single-row scalar (as q_gini_split)
    "q_bland_altman", // (bias, limits) single-row scalars for the two-pass inside share
    "q_vmeasure", // (n) + entropy-total single-row scalars
    "q_murphy", // (1+max), then (N, POS) totals — two single-row scalars
    "q_moran_geary", // (N, S) lattice totals single-row scalar over px + edges
    "q_assortativity", // (n_nodes) single-row scalar onto the 1-row moment agg
    "q_good_turing", // (N trigram total) single-row scalar over ≤6 cc rows
    "q_wilcoxon", // (time midpoint) single-row scalar (same as q_cuped)
    "q_ipf_raking", // (nt, kr, kc) table-total single-row scalars
    "q_hbos", // (per-feature maxima, N) single-row scalar (as q_ece)
    "q_heaps_law", // (regression sums) single-row scalar onto 10 decile rows
    "q_rdd", // (cutoff, bandwidth) single-row scalar (as q_confusion)
    "q_truncation_loss", // (total, ndocs) corpus-total single-row scalars
    "q_median_test", // (n) + (median) + (N, A) single-row scalars
    "q_concurrency", // (n_sessions) single-row scalar onto the 1-row sweep agg
    "q_woe_iv", // (1+max), then (G, B) totals — two single-row scalars (as q_murphy)
    "q_fairness", // (mean events, mean spend) threshold single-row scalars
    "q_nemenyi", // k²-bounded treatment pair product (5-row broadcast, as q_tukey)
    "q_cmh", // 1-row pooled chi2/OR scalar onto the 4-stratum rows
    "q_rich_club", // per-threshold (n_nodes)⋈(n_edges) 1-row summary joins
    "q_hubness", // brute-force query×corpus pool (as q_knn_bruteforce) + 1-row skew scalar
    "q_ipw_ate", // 1-row overall-ATE scalar onto the 10-stratum rows (as q_cmh)
    "q_aipw_ate", // regression-sums + totals 1-row scalars crossed (as q_ipw_ate)
    "q_uncertainty_coeff", // three 1-row entropy scalars crossed (as q_ref_integrity)
    "q_qte", // 3-row quantile probe against the per-arm rank relation
    "q_cindex") // (day, event, score) cell-grid pair product (as q_tukey)

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      // mechanical scale guard: no gate may plan an all-pairs product
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!NestedLoopAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every SQL-oracle query key has matching column aliases contract") {
    // oracleSql keys must be a subset of queries keys
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
