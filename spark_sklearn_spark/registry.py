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
# no key goes more than two rounds without a driver re-check. Round-5 order:
# the 13 pipeline4/pipeline5 additions (never driver-checked), 26 of the 28
# keys whose last driver-green row is CORRECTNESS_r02.json (q_set_union and
# q_set_union_distinct — trivial, pytest- and local-sweep-covered — rotate to
# r6), and 11 r3-last events-table queries, highest-risk because the
# fixture's ts column changed ns->us this round and sources/io.load grew a
# schema dispatch. Every key here re-verified green at sf0.01 by this
# round's full tools/check.py sweep. Rotating into r6's prefix: the 37
# remaining r3-last keys, q_set_union(_distinct), and the 24 queries added
# AFTER this order was pinned (never driver-checked, all green in r5's
# sf0.01 + sf0.001 local sweeps): q_agg_incremental, q_layout_zorder,
# q_profile_table, q_split_train, q_behavior_transitions,
# q_stream_foreach_upsert, q_agg_approx_percentile, q_fn_variant,
# q_sim_mmr_rerank, q_udf_iter, q_udtf_python, q_ts_interpolate,
# q_ml_keyed_cluster, q_behavior_rfm, q_graph_triangles, q_join_null_safe,
# q_fn_interval, q_agg_mode, q_url_canonical, q_dedup_url,
# q_text_boilerplate, q_corpus_health, q_scan_metadata, q_agg_moments.
# tests/test_queries_smoke.py asserts every name here is registered.
DRIVER_PRIORITY: list[str] = [
    # never driver-checked: pipeline4.py (quality gate / decontamination /
    # PII / anomaly / batched kNN / dim stats / PCA)
    "q_quality_gate",
    "q_decontaminate",
    "q_pii_redact",
    "q_ts_anomaly",
    "q_sim_knn_batch",
    "q_emb_dimstats",
    "q_emb_pca",
    # last driver-checked in r2 (three rounds stale — due now)
    "q_filter_like",
    "q_join_multiway",
    "q_join_outer",
    "q_join_outer_right",
    "q_join_cross",
    "q_agg_distinct",
    "q_agg_approx_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_stats",
    "q_win_rank",
    "q_win_analytic",
    "q_win_frame_rows",
    "q_win_frame_range",
    "q_sort_multi",
    "q_topk_limit",
    "q_set_intersect",
    "q_set_except",
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
    "q_fn_map",
    "q_fn_json",
    "q_stream_sliding",
    "q_stream_watermark",
    "q_stream_dedup",
    # r3-last events-table queries (fixture ts ns->us + io.load dispatch
    # change this round make these the highest-risk r3 keys)
    "q_source_json_props",
    "q_join_outer_full",
    "q_join_theta",
    "q_join_range_ts",
    "q_join_asof",
    "q_join_skew",
    "q_stream_tumbling",
    "q_stream_session",
    "q_stream_stateful",
    "q_udaf_grouped",
    "q_gapply_norm",
    # never driver-checked: pipeline5.py (packing / temperature mix /
    # repetition / embedding outliers / BM25 / PMI). q_set_union and
    # q_set_union_distinct (r2-stale, trivial, pytest- and local-sweep-
    # covered) rotate to r6 to make room.
    "q_pack_sequences",
    "q_sample_temperature",
    "q_text_repetition",
    "q_emb_outliers",
    "q_text_bm25",
    "q_text_pmi",
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
