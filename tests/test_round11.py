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

# The r11 window (canary + 2 hardened + 2 promotions + r10 batch +
# ML-fit + ANN families) went 50/50 green in CORRECTNESS_r11 and
# rotated to the back for r12; its membership pin retired with it.
# The live window pin is tests/test_round12.py.


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


def test_survey_keys_match_registry_exactly():
    """Key-level SURVEY§2↔registry parity (VERDICT r15 item 2): every
    backticked `q_*` in SURVEY.md must resolve to a registered key,
    and every registered key must appear in SURVEY — the gate whose
    absence let two 'declared' phantom rows (q_ts_concurrency,
    q_graph_hits) survive from r11 to r16 with no code behind them.
    The one range row (`q_tpch_q2`…`q_tpch_q22`) is expanded."""
    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    mentioned = set(re.findall(r"`(q_\w+)`", survey))
    if "q_tpch_q2" in mentioned and "q_tpch_q22" in mentioned:
        mentioned |= {f"q_tpch_q{i}" for i in range(2, 23)}
    registered = set(entry.queries())
    assert registered - mentioned == set(), (
        f"registered keys missing from SURVEY: "
        f"{sorted(registered - mentioned)}"
    )
    assert mentioned - registered == set(), (
        f"SURVEY names unregistered keys (phantom rows): "
        f"{sorted(mentioned - registered)}"
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
