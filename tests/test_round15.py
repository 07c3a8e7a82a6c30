"""Round-15 gates: the r15 driver-window rotation pin (the r14 pin
retired in test_round14.py), invariant + plan-shape checks for the
three new r15 keys, and the odds-ratio ln-guard regression pin
(ADVICE r14).
"""

from __future__ import annotations

import math

import __spark_entry__ as entry


# ---------------------------------------------------------------------------
# Driver-window rotation (r14 verdict item 1: clear the r5 staleness
# band — ≥45 r5 keys sampled; displaced keys lead the r16 window)
# ---------------------------------------------------------------------------

# The 48 keys whose latest driver sample is r5, recomputed from
# CORRECTNESS_r1..r14 at the r15 rotation (the r14 list minus
# q_agg_approx_distinct, which rode the r14 window).
R5_BAND = {
    "q_agg_cube", "q_agg_distinct",
    "q_agg_rollup", "q_agg_stats", "q_decontaminate", "q_emb_dimstats",
    "q_emb_outliers", "q_filter_like", "q_fn_date", "q_fn_json",
    "q_fn_map", "q_fn_math", "q_fn_string", "q_gapply_norm",
    "q_join_asof", "q_join_cross", "q_join_multiway", "q_join_outer",
    "q_join_outer_full", "q_join_outer_right", "q_join_range_ts",
    "q_join_skew", "q_join_theta", "q_pack_sequences", "q_pii_redact",
    "q_quality_gate", "q_sample_temperature", "q_set_except",
    "q_set_intersect", "q_sim_knn_batch", "q_sort_multi",
    "q_source_json_props", "q_stream_dedup", "q_stream_session",
    "q_stream_sliding", "q_stream_stateful", "q_stream_tumbling",
    "q_stream_watermark", "q_text_bm25", "q_text_pmi",
    "q_text_repetition", "q_topk_limit", "q_ts_anomaly",
    "q_udaf_grouped", "q_win_analytic", "q_win_frame_range",
    "q_win_frame_rows", "q_win_rank",
}

NEW_R15 = [
    "q_ml_fdr_bh", "q_text_good_turing", "q_behavior_removal_effect",
]

# the 3 name-last r5 keys displaced by the head's new/changed slots;
# they stay r5 and MUST lead the r16 window
DISPLACED_TO_R16 = {"q_win_frame_range", "q_win_frame_rows", "q_win_rank"}


def test_window_head_is_canary_plus_new_and_changed_keys():
    """Slot 0: the canary. Slots 1–3: the three NEW r15 declared keys
    (driver-sampled the round they land). Slot 4: q_ml_odds_ratio,
    whose oracle changed this round (the Wald CI ln numerator gained
    the NULLIF empty-cell guard — ADVICE r14) and must re-hash."""
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    assert DRIVER_PRIORITY[:5] == [
        "q_dq_engine_canary",
        *NEW_R15,
        "q_ml_odds_ratio",
    ]


def test_window_covers_r5_band():
    """The 45 name-first r5 keys fill the window's remaining slots
    (VERDICT r14 item 1: ≥45 r5-band keys sampled); the 3 displaced
    keys are exactly the name-last ones and sit immediately past the
    window, leading the r16 rotation."""
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    window = set(DRIVER_PRIORITY[:50])
    in_window = R5_BAND & window
    assert len(in_window) == 45, len(in_window)
    assert R5_BAND - window == DISPLACED_TO_R16
    assert set(DRIVER_PRIORITY[50:53]) == DISPLACED_TO_R16


def test_priority_tail_is_staleness_ordered():
    """Behind the 5-key head the list is (latest-sample round, name)
    sorted — the property that keeps every future rotation
    mechanical. Spot-check: all r5 keys precede every newer key."""
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    tail = DRIVER_PRIORITY[5:]
    pos = {k: i for i, k in enumerate(tail)}
    last_r5 = max(pos[k] for k in R5_BAND)
    first_other = min(i for k, i in pos.items() if k not in R5_BAND)
    assert last_r5 < first_other


# ---------------------------------------------------------------------------
# Odds-ratio ln guard (ADVICE r14)
# ---------------------------------------------------------------------------


def test_odds_ratio_oracle_guards_ln_numerator():
    """The Wald CI's ln argument must NULLIF-guard BOTH numerator
    cells: a=0 or d=0 makes ln(0) diverge across engines (Spark
    NULL, DuckDB -inf)."""
    sql = entry.oracle_sql()["q_ml_odds_ratio"]
    assert sql.count("ln(CAST(NULLIF(a, 0) AS DOUBLE)") == 2
    assert "ln(CAST(a AS DOUBLE)" not in sql


# ---------------------------------------------------------------------------
# New-key invariants (sf0.001 smoke grain)
# ---------------------------------------------------------------------------


def _rows(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir).collect()


def _plan(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_fdr_bh_is_a_valid_step_up(spark, sf_dir):
    """Ranks are a 1..m permutation ordered by ascending p, the
    rejection set is exactly the ranks ≤ k* prefix, the adjusted p
    is ≥ raw p and non-increasing from the bottom rank up (the
    step-up running min), and chi2/p replay within floor slop."""
    rows = sorted(_rows(spark, sf_dir, "q_ml_fdr_bh"), key=lambda r: r.rank_p)
    m = len(rows)
    assert [r.rank_p for r in rows] == list(range(1, m + 1))
    ps = [r.p_q9 for r in rows]
    assert ps == sorted(ps)
    rej = [r.rejected for r in rows]
    assert rej == sorted(rej, reverse=True)  # a prefix of the ranks
    for r in rows:
        assert 0 <= r.p_q9 <= 1_000_000_000
        assert r.p_adj_q9 >= r.p_q9  # BH never shrinks a p-value
        assert r.p_adj_q9 <= 1_000_000_000
        assert r.chi2_micro >= 0
        # p = exp(-chi2/2) replayed from the floored chi2 (1 ulp of
        # slop for the floor on chi2_micro feeding exp)
        p_replay = math.exp(-(r.chi2_micro / 1e6) / 2.0)
        assert abs(r.p_q9 / 1e9 - p_replay) < 1e-6
    adj = [r.p_adj_q9 for r in rows]
    assert adj == sorted(adj)  # monotone along ascending raw p


def test_fdr_bh_counts_cover_corpus(spark, sf_dir):
    from spark_sklearn_spark.sources.io import load

    rows = _rows(spark, sf_dir, "q_ml_fdr_bh")
    total = load(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_good_turing_replays_and_matches_hapax(spark, sf_dir):
    """r* replays exactly from the returned spectrum cells, and the
    unseen mass P_0 = N_1/N must agree with q_text_hapax's
    independent (n_hapax, n_tokens) moments per language."""
    rows = _rows(spark, sf_dir, "q_text_good_turing")
    assert rows
    hapax = {
        r.lang: (r.n_hapax, r.n_tokens)
        for r in _rows(spark, sf_dir, "q_text_hapax")
    }
    for r in rows:
        assert 1 <= r.r <= 5
        assert r.n_r >= 1
        assert r.r_star_micro == (r.r + 1) * r.n_r_next * 1000000 // r.n_r
        n1, n_tok = hapax[r.lang]
        assert r.p0_ppm == n1 * 1000000 // n_tok
        assert 0 <= r.p0_ppm <= 1_000_000


def test_removal_effect_monotone_and_shares(spark, sf_dir):
    """Removing a channel can only lose conversion mass (subset of
    sources, identical matrix, floor is monotone), effects replay
    from the returned q9 masses, and the attribution shares sum to
    ≤ 1e6 with only floor loss."""
    rows = _rows(spark, sf_dir, "q_behavior_removal_effect")
    assert rows
    base = rows[0].conv_base_q9
    assert all(r.conv_base_q9 == base for r in rows)
    share_sum = 0
    for r in rows:
        assert 0 <= r.conv_removed_q9 <= base
        e = base - r.conv_removed_q9
        assert r.removal_effect_ppm == e * 1000000 // base
        assert 0 <= r.removal_effect_ppm <= 1_000_000
        share_sum += r.attribution_ppm
    assert 1_000_000 - len(rows) < share_sum <= 1_000_000


def test_removal_effect_channels_are_nonpurchase_types(spark, sf_dir):
    from spark_sklearn_spark.sources.io import load
    import pyspark.sql.functions as F

    rows = _rows(spark, sf_dir, "q_behavior_removal_effect")
    types = {
        r.event_type
        for r in load(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r.channel for r in rows} == types - {"purchase"}


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def test_good_turing_is_scale_clean(spark, sf_dir):
    """The spectrum self-join and totals join ride broadcast hash
    joins on count-of-counts relations — no kill kind anywhere, so
    the key carries no exemption in test_scale_sweep.py."""
    plan = _plan(spark, sf_dir, "q_text_good_turing")
    for kill in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SinglePartition",
    ):
        assert kill not in plan, kill


def test_removal_effect_declared_plan_is_bounded_local(spark, sf_dir):
    """The declared DataFrame is the driver-side walk's bounded
    literal output (the corpus pass happened at construction inside
    the bounded collect): nothing in the declared plan may touch the
    corpus or trip a kill kind."""
    plan = _plan(spark, sf_dir, "q_behavior_removal_effect")
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "parquet" not in plan.lower()
    for kill in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SinglePartition",
    ):
        assert kill not in plan, kill
