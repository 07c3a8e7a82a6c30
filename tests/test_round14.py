"""Round-14 gates: invariant + plan-shape checks for the 21 new r14
keys and the rich-club oracle type-parity fix (ADVICE r13).

The r14 driver-window rotation pins lived here; the r15 rotation
retired them (tests/test_round15.py pins the live window now,
following the same convention that retired r13's pin in
test_round13.py).
"""

from __future__ import annotations

import math

import __spark_entry__ as entry


# ---------------------------------------------------------------------------
# Rich-club oracle type parity (ADVICE r13)
# ---------------------------------------------------------------------------


def test_rich_club_oracle_casts_grid_key():
    """The oracle's UNION-row grid key k must carry an explicit
    BIGINT cast (DuckDB bare integer literals are INTEGER; the
    driver hasher is type-strict — CORRECTNESS_r07 precedent)."""
    sql = entry.oracle_sql()["q_graph_rich_club"]
    assert "CAST(1 AS BIGINT) AS k" in sql
    assert "SELECT 1 AS k" not in sql


# ---------------------------------------------------------------------------
# New-key invariants (sf0.001 smoke grain)
# ---------------------------------------------------------------------------


def _rows(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir).collect()


def _plan(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_cramers_v_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ml_cramers_v")
    assert r.chi2_micro >= 0
    assert 0 <= r.v_ppm <= 1_000_000
    assert r.n_rows >= 1 and r.n_cols >= 1
    # V = sqrt(chi2 / (n·(min−1))) replayed on the returned BIGINTs
    v = math.sqrt(
        (r.chi2_micro / 1000000)
        / (float(r.n) * (min(r.n_rows, r.n_cols) - 1))
    )
    assert r.v_ppm == math.floor(v * 1000000)


def test_yule_k_is_simpson_consistent(spark, sf_dir):
    """K/10⁴ ≈ D under the with-replacement model: both derive from
    the same (S₂, N) moments, so recomputing K from the returned
    moments must reproduce the declared milli value exactly."""
    rows = _rows(spark, sf_dir, "q_text_yule_k")
    assert rows
    for r in rows:
        assert r.n_types <= r.n_tokens
        assert r.s2 >= r.n_tokens  # Σc² ≥ Σc
        k = math.floor(
            float(r.s2 - r.n_tokens)
            * 10000000
            / (float(r.n_tokens) * r.n_tokens)
        )
        assert r.yule_k_milli == k


def test_runs_test_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ts_runs_test")
    n = r.n_up + r.n_down
    assert 1 <= r.n_runs <= n
    # runs count can't exceed 2·min+1 (alternation bound)
    assert r.n_runs <= 2 * min(r.n_up, r.n_down) + 1
    mu = 2.0 * r.n_up * r.n_down / n + 1.0
    assert r.mu_micro == math.floor(mu * 1000000)


def test_turning_points_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ts_turning_points")
    assert 0 <= r.n_turning <= r.n_days - 2
    assert r.expected_micro == math.floor(
        2.0 * (r.n_days - 2) / 3.0 * 1000000
    )


def test_variance_ratio_consistency(spark, sf_dir):
    from spark_sklearn_spark.sources.io import load
    import pyspark.sql.functions as F

    [r] = _rows(spark, sf_dir, "q_ts_variance_ratio")
    n_days = (
        load(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .count()
    )
    assert r.n_increments == n_days - 1
    for q in (2, 4, 8):
        vr = getattr(r, f"vr{q}_ppm")
        assert vr is not None and vr >= 0


def test_hhi_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_behavior_hhi")
    assert rows
    for r in rows:
        # 1/n_users ≤ HHI ≤ 1 (floor slop on the lower bound)
        assert r.hhi_ppm >= math.floor(1000000.0 / r.n_users) - 1
        assert r.hhi_ppm <= 1_000_000
        if r.n_users > 1:
            assert 0 <= r.hhi_norm_ppm <= 1_000_000


def test_truss_support_covers_all_edges(spark, sf_dir):
    from spark_sklearn_spark.queries.pipeline2 import near_dup_edges

    rows = _rows(spark, sf_dir, "q_graph_truss_support")
    n_edges = near_dup_edges(spark, sf_dir).count()
    assert sum(r.n_edges for r in rows) == n_edges
    assert all(r.support >= 0 for r in rows)
    # support(e) ≤ min degree − 1; on any graph it's < n_edges
    assert all(r.support < max(n_edges, 1) for r in rows)


def test_cdc_chunk_invariants(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_dedup_cdc")
    assert 1 <= r.n_sigs <= r.n_chunks
    assert 0 <= r.dup_chunk_ppm < 1_000_000
    # every chunk holds ≥1 gram, so the mean is ≥ 1.0
    assert r.mean_len_micro >= 1_000_000
    assert r.dup_chunk_ppm == math.floor(
        float(r.n_chunks - r.n_sigs) / r.n_chunks * 1000000
    )


def test_brier_decomposition_identity(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ml_brier_decomp")
    assert r.reliability_q9 >= 0
    assert r.resolution_q9 >= 0
    # uncertainty = ō(1−ō) ≤ 1/4
    assert 0 <= r.uncertainty_q9 <= 250_000_000
    # Murphy identity holds up to the independent floors (±2 ulp-slop)
    assert (
        abs(
            r.brier_q9
            - (r.reliability_q9 - r.resolution_q9 + r.uncertainty_q9)
        )
        <= 2
    )
    # a proper binned Brier score lives in [0, 1]
    assert 0 <= r.brier_q9 <= 1_000_000_000


def test_dim_entropy_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_emb_dim_entropy")
    dims = {r.dim for r in rows}
    assert dims == set(range(1, len(rows) + 1))
    ln8_micro = math.floor(math.log(8.0) * 1000000)
    for r in rows:
        assert 0 <= r.entropy_micro <= ln8_micro
        # modal bin holds at least the uniform share
        assert r.top_bin_ppm >= 125_000 - 1


# ---------------------------------------------------------------------------
# Plan shapes: the keys that must trip NOTHING stay clean
# ---------------------------------------------------------------------------


def test_new_unexempted_keys_are_scale_clean(spark, sf_dir):
    """yule/hhi/truss/dim_entropy carry no exemption in
    test_scale_sweep.py — pin that their plans really are free of
    every kill kind, so a regression fails here with the key's name
    before the sweep's aggregate assert."""
    for name in (
        "q_text_yule_k",
        "q_behavior_hhi",
        "q_graph_truss_support",
        "q_emb_dim_entropy",
    ):
        plan = _plan(spark, sf_dir, name)
        for kill in (
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "SinglePartition",
        ):
            assert kill not in plan, (name, kill)


def test_cdc_chunking_stays_in_row(spark, sf_dir):
    """The cut must be the in-row form: no Window node (a doc-
    partitioned cumsum would shuffle every gram row) and no gram-
    grain generator — the only explode is the bounded per-doc chunk
    array (the CollapseProject inlining trap made the gram-grain
    posexplode re-run the interpreted hash transform per row:
    280 s vs ~2 s at sf0.1)."""
    plan = _plan(spark, sf_dir, "q_dedup_cdc")
    assert "Window" not in plan
    assert "posexplode" not in plan


# ---------------------------------------------------------------------------
# Batch-2 invariants
# ---------------------------------------------------------------------------


def test_theil_u_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ml_theil_u")
    # 0 ≤ I ≤ min(H(X), H(Y)) ⇒ both U in [0, 1]
    assert 0 <= r.mi_micro + 1  # floor slop on a tiny positive I
    assert -1 <= r.u_type_given_dow_ppm <= 1_000_000
    assert -1 <= r.u_dow_given_type_ppm <= 1_000_000
    assert r.mi_micro <= min(r.h_type_micro, r.h_dow_micro) + 1


def test_mcc_consistency(spark, sf_dir):
    """MCC and its companions replay exactly from the returned cells,
    and MCC stays within the J/markedness geometric-mean envelope."""
    [r] = _rows(spark, sf_dir, "q_ml_mcc")
    tp, fp, fn, tn = r.tp, r.fp, r.fn, r.tn
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r.mcc_micro - math.floor(mcc * 1000000)) <= 1
    assert -1_000_000 <= r.mcc_micro <= 1_000_000
    assert -1_000_000 <= r.youden_j_micro <= 1_000_000
    # MCC² = J · markedness (both signs shared) up to floor slop
    lhs = (r.mcc_micro / 1e6) ** 2
    rhs = (r.youden_j_micro / 1e6) * (r.markedness_micro / 1e6)
    assert abs(lhs - rhs) < 5e-5


def test_ece_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ml_ece")
    assert 1 <= r.n_bins <= 10
    # ECE is a weighted MEAN of gaps, so ECE ≤ MCE (up to floor slop)
    assert 0 <= r.ece_q6 <= r.mce_q6 + 1
    assert r.mce_q6 <= 1_000_000


def test_sample_entropy_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ts_sample_entropy")
    # an m=2 match implies its m=1 prefix matches
    assert 0 <= r.n_match_m2 <= r.n_match_m1
    if r.n_match_m2 > 0:
        assert r.sampen_micro >= 0
        se = -math.log(r.n_match_m2 / r.n_match_m1)
        assert r.sampen_micro == math.floor(se * 1000000)


def test_dow_eta2_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ts_dow_eta2")
    assert 0 <= r.eta2_ppm <= 1_000_000
    assert r.var_daily_floor >= 0


def test_user_overlap_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_behavior_user_overlap")
    assert rows
    types = set()
    for r in rows:
        types.update((r.type_a, r.type_b))
        assert r.type_a < r.type_b
        assert 0 < r.n_shared <= min(r.n_a, r.n_b)
        # Jaccard ≤ overlap always (|∪| ≥ min)
        assert r.jaccard_ppm <= r.overlap_ppm <= 1_000_000
    # all C(k,2) pairs present on the smoke fixture (dense co-usage)
    k = len(types)
    assert len(rows) == k * (k - 1) // 2


def test_batch2_clean_key_is_scale_clean(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_behavior_user_overlap")
    for kill in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SinglePartition",
    ):
        assert kill not in plan, kill


# ---------------------------------------------------------------------------
# Batch-3 invariants
# ---------------------------------------------------------------------------


def test_drawdown_invariants(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ts_drawdown")
    assert r.max_draw >= 0
    assert 0 <= r.longest_underwater <= r.n_underwater <= r.n_days
    assert r.underwater_ppm == math.floor(
        r.n_underwater / r.n_days * 1000000
    )


def test_mrr_dominates_like_a_rank_metric(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_ml_mrr")
    assert rows
    for r in rows:
        assert 0 <= r.mean_mrr_ppm <= 1_000_000
        assert 0 <= r.mean_p10_ppm <= 1_000_000
        # recall divides by k_eff ≤ 10, so recall ≥ precision@10
        assert r.mean_recall10_ppm >= r.mean_p10_ppm


def test_odds_ratio_identity(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "q_ml_odds_ratio")
    orr = (r.a * r.d) / (r.b * r.c)
    assert abs(r.odds_ratio_micro - math.floor(orr * 1000000)) <= 1
    # the Wald CI brackets the point estimate
    assert r.or_ci_lo_micro <= r.odds_ratio_micro <= r.or_ci_hi_micro


def test_ari_replays_from_moments(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_text_ari")
    assert rows
    for r in rows:
        assert r.n_chars >= r.n_words >= r.n_sentences >= r.n_docs
        ari = (
            4.71 * (r.n_chars / r.n_words)
            + 0.5 * (r.n_words / r.n_sentences)
            - 21.43
        )
        assert r.ari_centi == math.floor(ari * 100)


def test_conductance_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_graph_conductance")
    assert rows
    for r in rows:
        assert 0 < r.cut or r.conductance_ppm == 0
        assert 0 <= r.conductance_ppm <= 1_000_000
        # vol counts directed endpoints: ≥ 2·(n_nodes − 1) in a
        # connected community, ≥ n_nodes always
        assert r.vol >= r.n_nodes


def test_ari_is_scale_clean(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_text_ari")
    for kill in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SinglePartition",
    ):
        assert kill not in plan, kill
