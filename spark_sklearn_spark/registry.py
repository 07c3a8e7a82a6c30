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
# in iteration order (CORRECTNESS_r02.json is exactly registration-order keys
# 1-50). With >50 registered queries the tail is invisible to the hard gate,
# so we pin an explicit priority order: families with no driver-green row yet
# (UDF/ML/dedup/similarity/text/multimodal/TPC-H as of r02) plus every query
# added this round come first, backfilled with load-bearing re-checks of
# queries whose underlying operators changed this round. The remaining keys
# (all hash-green in CORRECTNESS_r02.json) follow in registration order and
# stay covered by tools/check.py sweeps + pytest.
DRIVER_PRIORITY: list[str] = [
    # r02-invisible families (registration positions 51-80 in round 2)
    "q_stream_stateful",
    "q_tpch_q3",
    "q_tpch_q10",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf_split",
    "q_gapply_norm",
    "q_ml_grid_search",
    "q_ml_random_search",
    "q_ml_vector_roundtrip",
    "q_ml_keyed_fit",
    "q_ml_keyed_transform",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_fingerprint",
    "q_sim_knn_brute",
    "q_sim_pairs_threshold",
    "q_text_stats",
    "q_text_tfidf",
    "q_text_quality",
    "q_multimodal_cols",
    "q_dedup_simhash",
    "q_sim_ann_ivf",
    "q_text_langid",
    "q_text_tokens",
    "q_multimodal_decode",
    "q_dedup_embedding",
    "q_dedup_clusters",
    # new in round 3 (never driver-checked)
    "q_join_skew",
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_dedup_embedding_lsh",
    "q_tpch_q7",
    "q_tpch_q18",
    "q_tpch_q21",
    # re-checks: flagship + queries whose operators change this round
    "q_agg_hash",
    "q_join_asof",
    "q_win_ntile",
    "q_join_theta",
    "q_join_range_ts",
    "q_stream_session",
    "q_agg_collect",
    "q_agg_grouping_sets",
    "q_join_outer_full",
    "q_fn_array",
    "q_scan_pushdown",
    "q_topk_per_group",
    "q_stream_tumbling",
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
