"""Round-11 gates: the driver-window rotation onto the 53
never-driver-checked declared keys (VERDICT r10 item 2), the SURVEY
§7 count drift gate (item 4), and invariants for the two hardened
queries whose outputs changed this round (q_ts_periodogram's
pow->multiply closing chain, q_dedup_recall_srp's exact
post-quantization copy scaling).
"""

from __future__ import annotations

import os
import re

import pytest

import __spark_entry__ as entry


# ---------------------------------------------------------------------------
# Driver-window rotation (VERDICT r10 item 2)
# ---------------------------------------------------------------------------

# The full never-driver-checked set as of CORRECTNESS_r10 (53 keys),
# minus the 4 deferred simple-relational keys documented in
# registry.py's window comment. Everything here MUST sit in the
# driver's 50-key check window this round.
ROUND11_MUST_BE_IN_WINDOW = {
    "q_dq_engine_canary",
    # changed outputs this round
    "q_ts_periodogram", "q_dedup_recall_srp",
    # rows-only -> declared promotions (newly declared outputs)
    "q_ml_keyed_cluster", "q_multimodal_resize",
    # r10 batch, never driver-checked
    "q_fn_bitmap_words", "q_graph_closeness", "q_ts_sax",
    "q_dq_outlier_iqr", "q_ts_peaks", "q_ml_isotonic_bins",
    "q_funnel_window", "q_ml_cohen_d",
    # declared ML-fit family
    "q_ml_kmeans", "q_ml_naive_bayes", "q_ml_gbm_round",
    "q_ml_tree_stump", "q_ml_tree_depth2", "q_ml_calibration",
    "q_ml_label_noise_knn",
    # ANN / embedding family
    "q_sim_ann_grid", "q_sim_ann_ivf_kmeans", "q_emb_pq_adc",
    "q_emb_hamming_knn", "q_dedup_recall_minhash",
    "q_emb_centroid_sim", "q_sim_mmr_exact",
    # remaining never-checked declared keys
    "q_fn_variant", "q_sql_recursive", "q_fn_timezone",
    "q_udf_iter", "q_udtf_python", "q_udtf_arrow",
    "q_behavior_transitions", "q_graph_triangles", "q_url_canonical",
    "q_dedup_url", "q_agg_incremental", "q_layout_zorder",
    "q_pivot_dynamic", "q_dedup_funnel",
    "q_graph_copurchase", "q_dedup_editdist", "q_ts_survival",
    "q_dedup_incremental", "q_sample_balanced", "q_dq_freshness",
    "q_behavior_lifecycle", "q_behavior_powerlaw",
    "q_dq_double_charge",
}


def test_driver_priority_covers_round11_risk():
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    window = set(DRIVER_PRIORITY[:50])
    assert ROUND11_MUST_BE_IN_WINDOW <= window, sorted(
        ROUND11_MUST_BE_IN_WINDOW - window
    )


def test_deferred_never_checked_lead_the_tail():
    """The 6 never-checked keys deferred past the cut must be the
    r12 window's head — positions 50..55 exactly."""
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    assert DRIVER_PRIORITY[50:56] == [
        "q_scan_metadata", "q_join_null_safe", "q_join_lateral",
        "q_win_nth", "q_agg_mode", "q_split_train",
    ]


# ---------------------------------------------------------------------------
# SURVEY §7 count gate (VERDICT r10 item 4)
# ---------------------------------------------------------------------------


def test_survey_section7_counts_match_registry():
    """SURVEY §7's '<N> registered queries (<M> declared' prose must
    match the live registry — the counts drifted silently in r9/r10
    because the drift gate only checked key PRESENCE."""
    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    m = re.search(r"(\d+) registered queries \((\d+) declared", survey)
    assert m, "SURVEY §7 count sentence not found"
    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_declared = sum(1 for k in qs if oracles.get(k))
    assert int(m.group(1)) == len(qs), (
        f"SURVEY says {m.group(1)} registered, registry has {len(qs)}"
    )
    assert int(m.group(2)) == n_declared, (
        f"SURVEY says {m.group(2)} declared, registry has {n_declared}"
    )


# ---------------------------------------------------------------------------
# Hardened-query invariants
# ---------------------------------------------------------------------------


def test_periodogram_power_bounds(spark, sf_dir):
    """Both periods present; rel power in [0, 1e6] (power <= total^2
    by Cauchy-Schwarz) and totals equal across periods (same series).
    No dominance assertion — at sf0.01 the events fixture has no
    weekly cycle strong enough to beat the period-11 floor."""
    rows = entry.queries()["q_ts_periodogram"](spark, sf_dir).collect()
    by_p = {r.period: r for r in rows}
    assert set(by_p) == {7, 11}
    for r in rows:
        assert 0 <= r.rel_power_micro <= 1_000_000, r
    assert by_p[7].total == by_p[11].total > 0


def test_srp_planted_copies_recall_exactly_one(spark, sf_dir):
    """With copies scaled AFTER quantization, sign bits are identical
    by construction: the cos^2=100 bucket must show candidate rate
    exactly 1e6 ppm (recall = 1, not just empirically)."""
    rows = (
        entry.queries()["q_dedup_recall_srp"](spark, sf_dir).collect()
    )
    # c2_bucket = signed cos^2-percent // 10, so the planted copies
    # (cos^2 = 100%) land in bucket 10.
    top = [r for r in rows if r.c2_bucket == 10]
    assert top, "no cos^2=100 bucket — planted copies missing"
    assert top[0].cand_rate_ppm == 1_000_000, top[0]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
