"""A/B experimentation analytics: Welch's two-sample t-test.

The statistic every experimentation pipeline computes — mean
difference between two arms with unequal variances. Mirrored through
the decimal policy: per-arm n / Σx / Σx² ride exact decimal sums in
ONE combinable agg, means and variances are the identical closed-form
double expressions on both engines, and outputs leave micro-quantized
(floor) per the r8 policy. sqrt is the only libm touch; the operand
doubles are bit-identical on both sides so the result can differ only
in the final ulp, absorbed by the micro floor except on exact
quantization boundaries (the same accepted residual risk as every
quantized metric in the suite).

Arms are click vs purchase event values, stratified by ISO weekday —
seven rows, fourteen moment cells, one scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC

_T_STAT = (
    "(m1 - m2) / sqrt(v1 / n1 + v2 / n2)"
)
_DERIVED = """
      SELECT iso_dow, n1, n2,
             s1 / n1 AS m1, s2 / n2 AS m2,
             (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
"""

_TTEST_ORACLE = f"""
    WITH labeled AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow, event_type, value
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    moments AS (
      SELECT iso_dow,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(30,10))
                           ELSE CAST(0 AS DECIMAL(30,10)) END)
                  AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(30,10))
                           ELSE CAST(0 AS DECIMAL(30,10)) END)
                  AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN CAST(value * value AS DECIMAL(30,10))
                           ELSE CAST(0 AS DECIMAL(30,10)) END)
                  AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value * value AS DECIMAL(30,10))
                           ELSE CAST(0 AS DECIMAL(30,10)) END)
                  AS DOUBLE) AS q2
      FROM labeled
      GROUP BY iso_dow
    ),
    derived AS (
      {_DERIVED}
      FROM moments
    )
    SELECT iso_dow, n1, n2,
           CAST(floor((m1 - m2) * 1000000.0) AS BIGINT) AS dmean_micro,
           CAST(floor({_T_STAT} * 1000000.0) AS BIGINT) AS t_micro
    FROM derived
    ORDER BY iso_dow
"""


@query("q_ml_ttest", oracle=_TTEST_ORACLE)
def q_ml_ttest(spark, d):
    """Welch two-sample t-test of click vs purchase values per ISO
    weekday (module docstring for the mirroring argument). ONE
    combinable scan fills both arms' (n, Σx, Σx²) cells
    simultaneously via conditional decimal sums — no per-arm scans,
    no join; the statistic is a stateless 7-row projection. This is
    the experimentation-analytics family member next to the rank
    metrics (AUC/KS) and calibration."""
    ev = load(spark, d, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    labeled = ev.select(
        (((F.dayofweek("ts") + 5) % 7) + 1).cast("long").alias("iso_dow"),
        "event_type",
        "value",
    )
    zero = F.lit(0).cast(DEC)
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    v = F.col("value")
    moments = labeled.groupBy("iso_dow").agg(
        F.sum(F.when(is1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(is2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(is1, v.cast(DEC)).otherwise(zero))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(is2, v.cast(DEC)).otherwise(zero))
        .cast("double")
        .alias("s2"),
        F.sum(F.when(is1, (v * v).cast(DEC)).otherwise(zero))
        .cast("double")
        .alias("q1"),
        F.sum(F.when(is2, (v * v).cast(DEC)).otherwise(zero))
        .cast("double")
        .alias("q2"),
    )
    derived = moments.selectExpr(
        "iso_dow",
        "n1",
        "n2",
        "s1 / n1 AS m1",
        "s2 / n2 AS m2",
        "(q1 - s1 * s1 / n1) / (n1 - 1) AS v1",
        "(q2 - s2 * s2 / n2) / (n2 - 1) AS v2",
    )
    return derived.selectExpr(
        "iso_dow",
        "n1",
        "n2",
        "cast(floor((m1 - m2) * 1000000.0d) as bigint) AS dmean_micro",
        f"cast(floor({_T_STAT} * 1000000.0d) as bigint) AS t_micro",
    ).orderBy("iso_dow")


# --------------------------------------------------------------------------
# Chi-square test of independence (event_type x ISO weekday)
# --------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH cells AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow, event_type,
             COUNT(*) AS o
      FROM events GROUP BY iso_dow, event_type
    ),
    rows_ AS (
      SELECT iso_dow, CAST(SUM(o) AS BIGINT) AS r FROM cells
      GROUP BY iso_dow
    ),
    cols_ AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS c FROM cells
      GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT CAST(
               ((ce.o * t.n - r.r * co.c) * 1.0
                * (ce.o * t.n - r.r * co.c))
               / (1.0 * r.r * co.c * t.n)
               AS DECIMAL(30,10)) AS term
      FROM cells ce
      JOIN rows_ r ON r.iso_dow = ce.iso_dow
      JOIN cols_ co ON co.event_type = ce.event_type
      CROSS JOIN tot t
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM rows_) AS n_rows,
             (SELECT COUNT(*) FROM cols_) AS n_cols
    )
    SELECT CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           CAST(floor(CAST((SELECT SUM(term) FROM terms) AS DOUBLE)
                      * 1000000.0) AS BIGINT) AS chi2_micro
    FROM counts
"""


@query("q_ml_chi2", oracle=_CHI2_ORACLE)
def q_ml_chi2(spark, d):
    """Chi-square test of independence between event type and ISO
    weekday. Per-cell terms use the all-integer identity
    (o*N - r*c)^2 / (r*c*N) — numerators are exact int64 products —
    and quantize to DECIMAL(30,10) BEFORE the final sum, so
    aggregation order cannot move the statistic (the q_text_kl_source
    construction). One count agg over the bounded (dow x type) grid,
    two marginal rollups of it, a 35-row term join: everything after
    the first scan is metadata-sized."""
    ev = load(spark, d, "events")
    cells = ev.groupBy(
        (((F.dayofweek("ts") + 5) % 7) + 1).cast("long").alias("iso_dow"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("iso_dow").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("event_type").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    terms = (
        cells.join(F.broadcast(rows_), "iso_dow")
        .join(F.broadcast(cols_), "event_type")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "cast(((o * n - r * c) * 1.0d * (o * n - r * c))"
            " / (1.0d * r * c * n) as decimal(30,10)) as term"
        )
    )
    chi2 = terms.agg(
        F.expr(
            "cast(floor(cast(sum(term) as double) * 1000000.0d)"
            " as bigint)"
        ).alias("chi2_micro")
    )
    counts = rows_.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        cols_.agg(F.count(F.lit(1)).alias("n_cols"))
    )
    return (
        counts.crossJoin(F.broadcast(chi2))
        .selectExpr(
            "cast((n_rows - 1) * (n_cols - 1) as bigint) AS dof",
            "chi2_micro",
        )
    )
