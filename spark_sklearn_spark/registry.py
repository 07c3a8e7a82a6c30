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
# no key goes more than two rounds without a driver re-check. Round-4 order:
# the 44 queries with no driver row yet (14 tpch2.py TPC-H completions,
# asof forward/nearest + Q7/Q18/Q21 which postdate r3's check, and the 25
# reshape/pipeline2/pipeline3/behavior/multimodal/streaming additions),
# then the two whose plans changed AFTER r3's check (broadcast-hint
# removals, 88528f9), then 4 of the 32 keys whose last driver-green row
# is CORRECTNESS_r02.json. Twenty-eight r2-stale keys wait for r5, picked
# to cost least: three are rows-only (their driver check is only rows>0),
# the rest are trivial unchanged projections/setops/sorts/windows with
# pytest-smoke coverage — and every one of them re-passed this round's
# full tools/check.py sf0.01 sweep.
# tests/test_queries_smoke.py asserts every name here is registered.
DRIVER_PRIORITY: list[str] = [
    # never driver-checked: TPC-H suite completion (tpch2.py)
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q22",
    # never driver-checked: added after r3's harness ran
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_tpch_q7",
    "q_tpch_q18",
    "q_tpch_q21",
    # never driver-checked: reshape.py / pipeline2.py additions
    "q_pivot_wide",
    "q_unpivot_long",
    "q_agg_percentile",
    "q_sample_hash",
    "q_dedup_ngram",
    "q_text_fingerprint_rolling",
    "q_emb_centroid",
    "q_upsert_snapshot",
    "q_stream_join",
    "q_win_distribution",
    "q_fuzzy_join",
    "q_text_winnow",
    # never driver-checked: pipeline3.py curation batch + binning/sampling
    "q_dedup_canonical",
    "q_text_chunk",
    "q_emb_quantize",
    "q_text_ngram_counts",
    "q_sample_stratified",
    "q_agg_histogram",
    # never driver-checked: behavior.py event analytics
    "q_funnel_ordered",
    "q_retention_cohort",
    "q_ts_gapfill",
    # never driver-checked: multimodal frame/resize + stream-static join
    "q_multimodal_frames",
    "q_multimodal_resize",
    "q_stream_static_join",
    "q_ts_rollup_multigrain",
    # plans changed after r3's check (broadcast removals, 88528f9)
    "q_dedup_clusters",
    "q_multimodal_cols",
    # last driver-checked in r2 (stale two rounds)
    "q_join_broadcast",
    "q_join_shuffle",
    "q_join_semi",
    "q_join_anti",
    # deferred to r5 (r2-green, unchanged; rows-only or trivial
    # pytest-covered projections/setops/sorts/windows — ALL re-verified
    # green at sf0.01 by this round's full tools/check.py sweep)
    "q_filter_like",
    "q_join_multiway",
    "q_join_outer",
    "q_join_outer_right",
    "q_agg_rollup",
    "q_agg_cube",
    "q_fn_date",
    "q_fn_math",
    "q_agg_distinct",
    "q_agg_stats",
    "q_win_rank",
    "q_fn_string",
    "q_stream_sliding",
    "q_win_analytic",
    "q_set_intersect",
    "q_set_except",
    "q_agg_approx_distinct",
    "q_stream_watermark",
    "q_stream_dedup",
    "q_win_frame_rows",
    "q_win_frame_range",
    "q_sort_multi",
    "q_topk_limit",
    "q_fn_map",
    "q_fn_json",
    "q_join_cross",
    "q_set_union",
    "q_set_union_distinct",
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
