"""Round-16 gates (the r16 rotation pin retired at the r17 rotation,
the r15 precedent): invariant + plan-shape checks for the
eight new r16 keys (q_ts_concurrency + q_graph_hits — the former
phantom SURVEY rows, VERDICT r15 item 1 — q_stream_hopping_topk +
q_dedup_containment_idf, the item-7 growth, q_ts_mann_kendall +
q_ts_sma_cross + q_ts_dickey_fuller, the ts-family growth, and
q_ml_hosmer_lemeshow, the calibration-family test), and the
removal-effect
degenerate-data guards (ADVICE r15). The key-level SURVEY↔registry
parity gate (VERDICT r15 item 2) lives next to the §7 count gate in
test_round11.py.
"""

from __future__ import annotations

from collections import namedtuple

import pytest

import __spark_entry__ as entry


# ---------------------------------------------------------------------------
# Removal-effect degenerate-data guards (ADVICE r15)
# ---------------------------------------------------------------------------

_Cell = namedtuple("Cell", ["src", "nxt", "is_first", "n"])


def test_removal_walk_rejects_sentinel_collision():
    """A REAL event type named 'conv'/'drop'/'__base__' would merge
    into the absorbing state identically on both engines — silent
    wrong attribution. The walk must refuse loudly instead."""
    from spark_sklearn_spark.queries.pipeline35 import _removal_walk

    for bad in ("conv", "drop", "__base__"):
        cells = [
            _Cell("view", bad, 1, 3),
            _Cell("view", "purchase", 0, 2),
        ]
        with pytest.raises(ValueError, match="sentinel"):
            _removal_walk(cells)
    # and as a source type too
    with pytest.raises(ValueError, match="sentinel"):
        _removal_walk([_Cell("drop", "purchase", 1, 1)])


def test_removal_walk_no_conversion_corpus_keeps_channels():
    """No (·,'purchase') transition anywhere: the walk still emits
    one row per channel with conv_base = 0 and NULL ratios — and the
    rewritten oracle (scalar-subquery base) now agrees; the old
    CROSS JOIN on the empty base CTE zeroed the oracle's row set
    (ADVICE r15 item 1)."""
    from spark_sklearn_spark.queries.pipeline35 import _removal_walk

    rows = _removal_walk(
        [
            _Cell("view", "click", 1, 4),
            _Cell("click", None, 1, 2),
            _Cell("click", "view", 0, 3),
        ]
    )
    assert [r[0] for r in rows] == ["click", "view"]
    for _, base, removed, eff, attr in rows:
        assert base == 0 and removed == 0
        assert eff is None and attr is None


def test_removal_oracle_base_is_scalar_subquery():
    """The oracle's base CTE must stay the COALESCE'd scalar
    subquery — a bare `WHERE rm = '__base__'` CTE is empty on a
    no-conversion corpus and CROSS JOIN silently drops every row."""
    sql = entry.oracle_sql()["q_behavior_removal_effect"]
    assert "COALESCE((SELECT cm FROM conv WHERE rm = '__base__'), 0)" in sql


# ---------------------------------------------------------------------------
# New-key invariants (sf0.001 smoke grain)
# ---------------------------------------------------------------------------


def test_concurrency_invariants(spark, sf_dir):
    """Peak is positive, never exceeds the day's active-session
    count; the time-weighted average never exceeds the peak; and the
    session-day segment total covers every sessionize session at
    least once (each session touches ≥ 1 day)."""
    rows = entry.queries()["q_ts_concurrency"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.peak_conc <= r.n_active_sessions
        assert r.span_us >= 0
        if r.conc_twa_milli is not None:
            assert 0 <= r.conc_twa_milli <= r.peak_conc * 1000
    n_sessions = (
        entry.queries()["q_behavior_sessionize"](spark, sf_dir).count()
    )
    assert sum(r.n_active_sessions for r in rows) >= n_sessions


def test_concurrency_plan_is_day_partitioned(spark, sf_dir):
    """No global window, no nested-loop join, no single-partition
    exchange anywhere: the sweep-line cumsum partitions by day and
    the session build by user."""
    from spark_sklearn_spark.plans import assert_scalable

    assert_scalable(entry.queries()["q_ts_concurrency"](spark, sf_dir))


def test_hits_invariants(spark, sf_dir):
    """Both roles present; round-1 hub weight is the degree (≥ 1);
    the round-2 hub weight dominates degree² (h2(c) = Σ_{p∈P(c)}
    a1(p) and every a1(p) ≥ h1(c) for a buyer c of p); and each
    role's L1 ppm shares sum to 1e6 within floor slop."""
    rows = entry.queries()["q_graph_hits"](spark, sf_dir).collect()
    roles = {r.role for r in rows}
    assert roles == {"hub", "auth"}
    by_role = {
        role: [r for r in rows if r.role == role] for role in roles
    }
    for r in by_role["hub"]:
        assert r.w1 >= 1
        assert r.w2 >= r.w1 * r.w1
    for role, rs in by_role.items():
        total = sum(r.score_ppm for r in rs)
        assert 1_000_000 - len(rs) <= total <= 1_000_000


def test_hopping_topk_invariants(spark, sf_dir):
    """Every window carries at most 3 ranked rows in count-descending
    order, and every window start sits on the 15-minute hop grid."""
    rows = entry.queries()["q_stream_hopping_topk"](spark, sf_dir).collect()
    assert rows
    by_win = {}
    for r in rows:
        assert r.window_start.minute % 15 == 0
        assert r.window_start.second == 0
        by_win.setdefault(r.window_start, []).append(r)
    for rs in by_win.values():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        counts = [r.n_events for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_containment_idf_invariants(spark, sf_dir):
    """Intersection mass never exceeds either side's total (ppm ≤
    1e6), every surfaced pair clears the 0.6 ppm threshold in at
    least one direction, and the weighted pair set stays inside the
    unweighted containment candidate universe (same postings join,
    same DF cap)."""
    rows = entry.queries()["q_dedup_containment_idf"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 < r.wi <= min(r.w_a, r.w_b)
        assert r.cont_idf_a_ppm <= 1_000_000
        assert r.cont_idf_b_ppm <= 1_000_000
        assert max(r.cont_idf_a_ppm, r.cont_idf_b_ppm) >= 600_000


def test_mann_kendall_invariants(spark, sf_dir):
    """|S| is bounded by the pair count C(n,2); var18 matches the
    closed form replayed on the returned integers (no ties can make
    it exceed the untied value); Z's sign agrees with S."""
    rows = entry.queries()["q_ts_mann_kendall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r.n_days
        assert abs(r.s_stat) <= n * (n - 1) // 2
        assert r.var18 <= n * (n - 1) * (2 * n + 5)
        assert r.var18 >= 0
        if r.z_micro is not None and r.s_stat != 0:
            assert (r.z_micro >= 0) == (r.s_stat > 0) or r.z_micro in (
                -1,
                0,
            )  # floor slop at tiny |Z|


def test_sma_cross_alternates_per_type(spark, sf_dir):
    """Consecutive crossings within a type must alternate direction
    (golden can only follow death and vice versa), and the stored
    diff signs must match the direction labels."""
    rows = entry.queries()["q_ts_sma_cross"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        assert (r.direction == "golden") == (r.diff > 0)
        assert r.diff_prev is not None and r.diff_prev != 0
        assert (r.diff > 0) != (r.diff_prev > 0)
        by_type.setdefault(r.event_type, []).append(r.direction)
    for dirs in by_type.values():
        for prev, cur in zip(dirs, dirs[1:]):
            assert prev != cur


def test_hosmer_lemeshow_consistency_with_ece(spark, sf_dir):
    """Same fit, same decile bins: HL's n and bin count must match
    q_ml_ece's, HL is nonnegative, and df = bins − 2."""
    hl = entry.queries()["q_ml_hosmer_lemeshow"](spark, sf_dir).collect()[0]
    ece = entry.queries()["q_ml_ece"](spark, sf_dir).collect()[0]
    assert hl.n == ece.n
    assert hl.n_bins == ece.n_bins
    assert hl.df == hl.n_bins - 2
    assert hl.hl_q6 >= 0


def test_dickey_fuller_replays_from_moments(spark, sf_dir):
    """The shipped BIGINT moments must reproduce beta_micro and
    df_t_micro exactly via the same closed form — the replayability
    guarantee the moments exist for."""
    import math

    rows = entry.queries()["q_ts_dickey_fuller"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, sx, sy, sxx, sxy, syy = r.n_obs, r.sx, r.sy, r.sxx, r.sxy, r.syy
        d_det = n * sxx - sx * sx
        if n < 3 or d_det <= 0:
            assert r.beta_micro is None and r.df_t_micro is None
            continue
        beta = float(n * sxy - sx * sy) / float(d_det)
        assert r.beta_micro == math.floor(beta * 1000000)
        sse = (float(syy) - float(sy) * sy / n) - beta * (
            float(sxy) - float(sx) * sy / n
        )
        var_b = sse / (n - 2) * n / float(d_det)
        rt = math.sqrt(var_b)
        if rt == 0:
            assert r.df_t_micro is None
        else:
            assert r.df_t_micro == math.floor(beta / rt * 1000000)
