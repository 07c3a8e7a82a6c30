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
# no key goes more than two rounds without a driver re-check. Round-7 order:
# the 25 queries added in r6 AFTER the r6 order was pinned, then the r7
# additions in landing order. The 50-key window cuts inside the r7 block at
# q_ml_linear_ols, so rotating into r8's prefix (in this order): (1) the r7
# keys BELOW the cut — q_ts_seasonal, q_emb_hamming_knn, q_cdc_snapshot_diff,
# q_dq_freshness, q_sim_ann_grid, q_ts_twap, q_behavior_lifecycle,
# q_udtf_arrow, q_win_pct_change, q_sql_recursive, q_ml_auc, q_ml_confusion,
# q_fn_timezone, q_ml_pr_curve, q_ts_autocorr, q_sim_mmr_exact, q_ml_gains,
# q_ml_ks, q_win_ignore_nulls, q_pivot_multi_agg, q_dedup_funnel,
# q_ts_backtest, q_text_perplexity, q_text_kl_source, q_emb_recall_grid,
# q_graph_copurchase, q_dq_schema_drift, q_ml_naive_bayes, q_ml_kmeans,
# q_ml_logreg, q_ts_cusum, q_emb_pq_adc, q_dedup_recall_minhash,
# q_sim_ann_ivf_kmeans, q_ml_tree_stump, q_ml_tree_depth2, plus
# q_graph_pagerank (promoted rows-only -> declared this round, needs a
# declared row); (2) anything r8 adds; (3) the oldest r3/r4-green keys
# (q_ml_keyed_fit/transform, q_multimodal_*, scan family, q_tpch_q3/q5/q6/
# q10, text r3 family). All r7-new keys are green in local
# sf0.001+sf0.01+sf0.1 tools/check.py sweeps this round.
# tests/test_queries_smoke.py asserts every name here is registered.
DRIVER_PRIORITY: list[str] = [
    # r6 additions never seen by the driver (declared unless noted)
    "q_behavior_sessionize",
    "q_ts_ohlc",
    "q_cdc_scd2",
    "q_text_entropy",
    "q_text_containment",
    "q_agg_listagg",
    "q_text_readability",
    "q_source_csv_roundtrip",
    "q_profile_corr",
    "q_ts_ewma",
    "q_ml_keyed_scale",
    "q_graph_pagerank",  # promoted rows-only -> declared in r7
    "q_behavior_streaks",
    "q_basket_lift",
    "q_agg_weighted",
    "q_funnel_latency",
    "q_win_pareto",
    "q_dedup_semantic_cluster",
    "q_behavior_attribution",
    "q_source_partitioned_prune",
    "q_agg_bitmap",
    "q_agg_bitwise",
    "q_fn_surrogate_key",
    "q_ts_calendar_dim",
    "q_emb_prefix_eval",
    # NEW-THIS-ROUND (r7): append new query keys here as they land so they
    # get a driver row in CORRECTNESS_r07
    "q_sketch_countmin",
    "q_sketch_bloom",
    "q_sketch_hll",
    "q_feat_onehot",
    "q_feat_hashing",
    "q_feat_target_encode",
    "q_feat_quantile_bin",
    "q_source_jsonl_roundtrip",
    "q_source_orc_roundtrip",
    "q_layout_compaction",
    "q_graph_degree_dist",
    "q_dedup_bow",
    "q_text_bpe_pairs",
    "q_text_hapax",
    "q_text_zipf",
    "q_win_running_distinct",
    "q_dq_orphans",
    "q_source_schema_evolution",
    "q_sample_weighted",
    "q_ts_outlier_mad",
    "q_mix_budget",
    "q_text_keywords",
    "q_stream_topk",
    "q_sketch_hll_merge",
    "q_ml_linear_ols",
    "q_ts_seasonal",
    "q_emb_hamming_knn",
    "q_cdc_snapshot_diff",
    "q_dq_freshness",
    "q_sim_ann_grid",
    "q_ts_twap",
    "q_behavior_lifecycle",
    "q_udtf_arrow",
    "q_win_pct_change",
    "q_sql_recursive",
    "q_ml_auc",
    "q_ml_confusion",
    "q_fn_timezone",
    "q_ml_pr_curve",
    "q_ts_autocorr",
    "q_sim_mmr_exact",
    "q_ml_gains",
    "q_ml_ks",
    "q_win_ignore_nulls",
    "q_pivot_multi_agg",
    "q_dedup_funnel",
    "q_ts_backtest",
    "q_text_perplexity",
    "q_text_kl_source",
    "q_emb_recall_grid",
    "q_graph_copurchase",
    "q_dq_schema_drift",
    "q_ml_naive_bayes",
    "q_ml_kmeans",
    "q_ml_logreg",
    "q_ts_cusum",
    "q_emb_pq_adc",
    "q_dedup_recall_minhash",
    "q_sim_ann_ivf_kmeans",
    "q_ml_tree_stump",
    "q_ml_tree_depth2",
    "q_dedup_editdist",
    "q_ts_survival",
    "q_search_hybrid_rrf",
    "q_ml_gbm_round",
    "q_ml_calibration",
    "q_emb_centroid_sim",
    "q_ml_label_noise_knn",
    "q_dedup_incremental",
    "q_sample_balanced",
    # r3-green keys with the oldest driver rows on file
    "q_ml_keyed_fit",
    "q_ml_keyed_transform",
    "q_ml_vector_roundtrip",
    "q_multimodal_decode",  # rows-only
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
    # r3-green overflow (checked if the prefix window allows)
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
