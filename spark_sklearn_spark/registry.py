"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2B registers here with a name, a
callable ``(spark, sf_dir) -> DataFrame``, and (when the semantics are
exactly SQL-expressible) a DuckDB oracle SQL string. ``__spark_entry__``
re-exports these dicts verbatim.

Declared queries (with an oracle) are hash-checked by the driver;
rows-only queries (oracle=None) get a weaker rows>0 check — reserve
those for genuinely non-SQL-expressible ops (approximate sketches,
ML training, streaming state).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver's differential harness checks the FIRST 50 keys of ``queries()``
# in iteration order. With >50 registered queries the tail is invisible to the
# hard gate, so we pin an explicit priority order and ROTATE it each round so
# no key goes more than two rounds without a driver re-check.
#
# Round-11 order. CORRECTNESS_r10 was a clean 50/50 (canary + 30
# ROUND-band conversions + 2 promoted/rewritten keys + 17 r9 batch
# H-L keys), so that window rotates to the back. This round's window
# is the VERDICT r10 item-2 rotation: the driver has cumulatively
# sampled 322 distinct keys over r1-r10 but 53 declared keys have
# NEVER been driver-checked (judge-swept green only). Window plan:
# (1) the canary; (2) the 2 keys whose outputs changed this round
# (q_ts_periodogram pow->multiply hardening, q_dedup_recall_srp
# exact post-quantization copy scaling — both were never-checked
# anyway); (3) the 2 rows-only -> declared promotions
# (q_ml_keyed_cluster decimal-policy Lloyd, q_multimodal_resize
# raster replay) — newly declared, MUST be driver-sampled; (4) the
# other 8 r10-batch keys; (5) the declared ML-fit family; (6) the
# ANN/embedding family; (7) the remaining never-checked keys. That
# is exactly 50. Past the cut: the 6 deferred never-checked keys
# (simple relational surface — q_scan_metadata / q_join_null_safe /
# q_join_lateral / q_win_nth / q_agg_mode / q_split_train) lead the
# r12 window, then the r10 window keys (all green r10) rotate
# behind, then the rest in prior rotation order.
# tests/test_queries_smoke.py asserts every name here is registered;
# tests/test_round11.py pins the must-be-in-window set.
DRIVER_PRIORITY: list[str] = [
    "q_dq_engine_canary",
    "q_ts_periodogram",
    "q_dedup_recall_srp",
    "q_ml_keyed_cluster",
    "q_multimodal_resize",
    "q_fn_bitmap_words",
    "q_graph_closeness",
    "q_ts_sax",
    "q_dq_outlier_iqr",
    "q_ts_peaks",
    "q_ml_isotonic_bins",
    "q_funnel_window",
    "q_ml_cohen_d",
    "q_ml_kmeans",
    "q_ml_naive_bayes",
    "q_ml_gbm_round",
    "q_ml_tree_stump",
    "q_ml_tree_depth2",
    "q_ml_calibration",
    "q_ml_label_noise_knn",
    "q_sim_ann_grid",
    "q_sim_ann_ivf_kmeans",
    "q_emb_pq_adc",
    "q_emb_hamming_knn",
    "q_dedup_recall_minhash",
    "q_emb_centroid_sim",
    "q_sim_mmr_exact",
    "q_fn_variant",
    "q_sql_recursive",
    "q_fn_timezone",
    "q_udf_iter",
    "q_udtf_python",
    "q_udtf_arrow",
    "q_behavior_transitions",
    "q_graph_triangles",
    "q_url_canonical",
    "q_dedup_url",
    "q_agg_incremental",
    "q_layout_zorder",
    "q_pivot_dynamic",
    "q_dedup_funnel",
    "q_graph_copurchase",
    "q_dedup_editdist",
    "q_ts_survival",
    "q_dedup_incremental",
    "q_sample_balanced",
    "q_dq_freshness",
    "q_behavior_lifecycle",
    "q_behavior_powerlaw",
    "q_dq_double_charge",
    # ---- 50-key window cuts exactly here ----
    # deferred never-checked (r12 window head)
    "q_scan_metadata",
    "q_join_null_safe",
    "q_join_lateral",
    "q_win_nth",
    "q_agg_mode",
    "q_split_train",
    # prior-rotation order (r10 window keys green r10, then older)
    "q_ml_auc",
    "q_ml_confusion",
    "q_ml_pr_curve",
    "q_ml_gains",
    "q_ml_ks",
    "q_ts_cusum",
    "q_ts_twap",
    "q_ts_autocorr",
    "q_ts_seasonal",
    "q_ts_backtest",
    "q_ts_interpolate",
    "q_behavior_rfm",
    "q_text_perplexity",
    "q_text_kl_source",
    "q_text_boilerplate",
    "q_corpus_health",
    "q_dq_schema_drift",
    "q_search_hybrid_rrf",
    "q_ml_logreg",
    "q_emb_recall_grid",
    "q_agg_moments",
    "q_agg_boolean",
    "q_profile_table",
    "q_pivot_multi_agg",
    "q_cdc_snapshot_diff",
    "q_win_range_interval",
    "q_win_pct_change",
    "q_win_ignore_nulls",
    "q_fn_interval",
    "q_fn_try_arith",
    "q_dedup_simhash",
    "q_emb_pca",
    "q_dq_crossfield",
    "q_ml_friedman",
    "q_behavior_uplift",
    "q_ts_lttb",
    "q_ml_cluster_purity",
    "q_ml_rand_index",
    "q_graph_adamic_adar",
    "q_ts_bollinger",
    "q_pii_tokenize",
    "q_join_pit_scd2",
    "q_dq_table_checksum",
    "q_ts_esd",
    "q_ml_nmi",
    "q_ts_granger",
    "q_ml_tost",
    "q_source_glob_tree",
    "q_ml_kruskal",
    "q_win_running_distinct",
    "q_sample_weighted",
    "q_ts_outlier_mad",
    "q_mix_budget",
    "q_behavior_ltv",
    "q_stream_upsert_final",
    "q_multimodal_hash",
    "q_agg_approx_percentile",
    "q_emb_pca_topk",
    "q_text_minhash_containment",
    "q_ts_changepoint",
    "q_feat_woe",
    "q_graph_jaccard_nbrs",
    "q_ts_hurst",
    "q_behavior_absorbing",
    "q_text_simpson",
    "q_join_range_bucket",
    "q_ml_spearman",
    "q_ml_kendall",
    "q_graph_assortativity",
    "q_behavior_gaps",
    "q_sample_reservoir",
    "q_dq_reconcile",
    "q_tpch_q1",
    "q_source_binaryfile",
    "q_graph_modularity",
    "q_emb_whiten",
    "q_win_gaps_islands",
    "q_sample_neyman",
    "q_emb_ann_recall_ivf",
    "q_ml_mannwhitney",
    "q_ml_anova",
    "q_ts_pacf",
    "q_sketch_theta",
    "q_sketch_ams",
    "q_fn_ip",
    "q_geo_grid_join",
    "q_dq_skew",
    "q_graph_label_prop",
    "q_ml_logrank",
    "q_ml_mcnemar",
    "q_ml_kappa",
    "q_ml_bootstrap_ci",
    "q_join_asof_tolerance",
    "q_layout_file_skipping",
    "q_source_json_corrupt",
    "q_ml_silhouette",
    "q_ml_davies_bouldin",
    "q_ml_kcenter_init",
    "q_ml_keyed_fit",
    "q_ml_keyed_transform",
    "q_ml_vector_roundtrip",
    "q_multimodal_decode",
    "q_project_expr",
    "q_scan_parquet",
    "q_scan_projection",
    "q_scan_pushdown",
    "q_text_langid",
    "q_text_quality",
    "q_text_tfidf",
    "q_text_tokens",
    "q_topk_per_group",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_udf_scalar",
    "q_udtf_split",
    "q_win_ntile",
    "q_source_json_props",
    "q_agg_distinct",
    "q_filter_like",
    "q_fn_date",
    "q_fn_string",
]



def ordered_queries() -> dict[str, QueryFn]:
    """Registry in driver-priority order (see ``DRIVER_PRIORITY``)."""
    head = [n for n in DRIVER_PRIORITY if n in QUERIES]
    tail = [n for n in QUERIES if n not in set(head)]
    return {n: QUERIES[n] for n in [*head, *tail]}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from . import queries  # noqa: F401  (importing populates the registry)
