"""Round-15 gates: invariant + plan-shape checks for the three new
r15 keys and the odds-ratio ln-guard regression pin (ADVICE r14).

The r15 driver-window rotation pins lived here; the r16 rotation
retired them (tests/test_round16.py pins the live window now,
following the same convention that retired r14's pin in
test_round14.py).
"""

from __future__ import annotations

import math

import __spark_entry__ as entry


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
