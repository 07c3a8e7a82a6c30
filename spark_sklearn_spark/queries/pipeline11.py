"""Round-8 continuation 2: rule-based expectation audit, cohort LTV
curve, edit-distance scalar functions, and two-feature OLS.

The expectation audit is the declarative data-quality operator
(great-expectations style): each rule is a boolean predicate counted
in ONE combinable scan, reported one row per rule. The LTV curve
extends retention cohorts with cumulative revenue per cohort age — the
window cumsum runs over INTEGER cents (CLAUDE.md: decimal-quantize
per-row terms before window cumsums; DuckDB's segment-tree window adds
floats in a different order). Edit distance closes the fuzzy-matching
scalar-function row: both engines ship the classic Wagner-Fischer
levenshtein, so the column is portable as-is. Two-feature OLS extends
q_ml_linear_ols's moments-then-solve mirroring to a 3x3 normal-
equation system via Cramer's rule.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC

# --------------------------------------------------------------------------
# Declarative expectation audit (rule -> pass/fail counts)
# --------------------------------------------------------------------------

# (rule key, SQL boolean — identical text on both engines)
DQ_RULES = (
    ("price_positive", "o_totalprice > 0"),
    ("date_in_range",
     "o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'"
     " AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"),
    ("priority_known",
     "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
     "'4-NOT SPECIFIED','5-LOW')"),
    ("custkey_present", "o_custkey IS NOT NULL"),
    ("status_known", "o_orderstatus IN ('F','O','P')"),
)

_RULES_ORACLE = f"""
    WITH agg AS (
      SELECT COUNT(*) AS n_checked,
             {", ".join(
                 f"CAST(SUM(CASE WHEN {expr} THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS p_{key}" for key, expr in DQ_RULES)}
      FROM orders
    )
    {" UNION ALL ".join(
        f"SELECT '{key}' AS rule, n_checked, p_{key} AS n_pass,"
        f" n_checked - p_{key} AS n_fail FROM agg"
        for key, _ in DQ_RULES)}
    ORDER BY rule
"""


@query("q_dq_rules", oracle=_RULES_ORACLE)
def q_dq_rules(spark, d):
    """Declarative expectation audit: five boolean rules over orders
    (positive amounts, date range, enum domains, key presence)
    counted in ONE combinable scan and reported one row per rule —
    the great-expectations-style gate a pipeline publishes before
    promoting a snapshot. The rule list is data; adding a rule adds a
    CASE column, never a scan. At 100 TB this is a single pass with a
    constant-width partial aggregate."""
    orders = load(spark, d, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[
            F.sum(F.when(F.expr(expr), 1).otherwise(0)).alias(f"p_{key}")
            for key, expr in DQ_RULES
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(key).alias("rule"),
                F.col("n_checked").alias("n_checked"),
                F.col(f"p_{key}").alias("n_pass"),
                (F.col("n_checked") - F.col(f"p_{key}")).alias("n_fail"),
            )
            for key, _ in DQ_RULES
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.rule", "r.n_checked", "r.n_pass", "r.n_fail")
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per cohort age, integer cents)
# --------------------------------------------------------------------------

_LTV_ORACLE = """
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  CAST(date_trunc('day', e.ts)
                                       AS TIMESTAMP)) / 7.0) AS BIGINT)
                 AS age_week,
             CAST(floor(SUM(CAST(e.value AS DECIMAL(30,10))) * 100)
                  AS BIGINT) AS rev_cents,
             COUNT(DISTINCT e.user_id) AS n_active
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY f.cohort_week, age_week
    )
    SELECT cohort_week, age_week, n_active, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
                                     ORDER BY age_week
                                     ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_rev_cents
    FROM rev
    ORDER BY cohort_week, age_week
"""


@query("q_behavior_ltv", oracle=_LTV_ORACLE)
def q_behavior_ltv(spark, d):
    """Cohort LTV curve: users cohort by first-event week; purchase
    revenue aggregates per (cohort, age-in-weeks) through the exact
    decimal path INTO INTEGER CENTS, and the lifetime-value cumsum
    runs over those integers — so the window aggregation order
    (Spark running-accumulate vs DuckDB segment tree) cannot move a
    bit. The revenue relation is cohort x age (bounded by the
    calendar), so the window is metadata-sized; the data-sized work
    is one join on user_id and one combinable agg."""
    ev = load(spark, d, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    purch = ev.filter(F.col("event_type") == "purchase")
    rev = (
        purch.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("day", F.col("ts")), F.col("cohort_week")
                )
                / 7.0
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(
            F.floor(F.sum(F.col("value").cast(DEC)) * 100)
            .cast("long")
            .alias("rev_cents"),
            F.count_distinct("user_id").alias("n_active"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        "cohort_week",
        "age_week",
        "n_active",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    ).orderBy("cohort_week", "age_week")


# --------------------------------------------------------------------------
# Edit-distance scalar functions (fuzzy-matching row of the fn matrix)
# --------------------------------------------------------------------------


@query(
    "q_fn_editdist",
    oracle="""
        SELECT s_suppkey,
               CAST(levenshtein(s_name, 'Supplier#000000001') AS BIGINT)
                   AS d_canon,
               CAST(levenshtein(substr(s_name, 1, 9),
                                'Supplier#') AS BIGINT) AS d_prefix,
               CAST(CASE WHEN levenshtein(s_name,
                                          'Supplier#000000001') <= 2
                         THEN 1 ELSE 0 END AS BIGINT) AS near_canon
        FROM supplier
        ORDER BY s_suppkey
    """,
)
def q_fn_editdist(spark, d):
    """Edit-distance scalar functions: Levenshtein distance of each
    supplier name to a canonical form, a prefix sanity distance, and
    a <=2 near-match flag — the fuzzy-matching primitive the
    q_fuzzy_join operator uses in blocked form, exercised here as a
    plain scalar so the fn matrix covers it. Both engines implement
    the classic Wagner-Fischer DP, so values are identical; cost is
    one stateless scan (O(len^2) per row, bounded by name length)."""
    sup = load(spark, d, "supplier")
    lev = F.levenshtein("s_name", F.lit("Supplier#000000001"))
    return sup.select(
        "s_suppkey",
        lev.cast("long").alias("d_canon"),
        F.levenshtein(F.substring("s_name", 1, 9), F.lit("Supplier#"))
        .cast("long")
        .alias("d_prefix"),
        F.when(lev <= 2, 1).otherwise(0).cast("long").alias("near_canon"),
    ).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# Two-feature OLS (normal equations via Cramer's rule)
# --------------------------------------------------------------------------

_OLS2_SUMS = """
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                 AS s1,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE)
                 AS s2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10)))
                  AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,10)))
                  AS DOUBLE) AS s11,
             CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(30,10)))
                  AS DOUBLE) AS s12,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,10)))
                  AS DOUBLE) AS s22,
             CAST(SUM(CAST(l_quantity * l_extendedprice
                           AS DECIMAL(30,10))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(l_discount * l_extendedprice
                           AS DECIMAL(30,10))) AS DOUBLE) AS s2y
      FROM lineitem
      GROUP BY l_returnflag
"""

# Cramer's rule on the 3x3 normal equations [n s1 s2; s1 s11 s12;
# s2 s12 s22] [b0 b1 b2]^T = [sy s1y s2y]^T — the SAME double
# expression text on both engines, micro-quantized at the end.
_D = ("(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
      " + s2*(s1*s12 - s11*s2))")
_D0 = ("(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)"
       " + s2*(s1y*s12 - s11*s2y))")
_D1 = ("(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)"
       " + s2*(s1*s2y - s1y*s2))")
_D2 = ("(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)"
       " + sy*(s1*s12 - s11*s2))")

_OLS2_ORACLE = f"""
    WITH sums AS ({_OLS2_SUMS})
    SELECT l_returnflag, n,
           CAST(round({_D0} / {_D} * 1000000.0) AS BIGINT)
               AS intercept_micro,
           CAST(round({_D1} / {_D} * 1000000.0) AS BIGINT)
               AS beta_qty_micro,
           CAST(round({_D2} / {_D} * 1000000.0) AS BIGINT)
               AS beta_disc_micro
    FROM sums
    ORDER BY l_returnflag
"""


@query("q_ml_ols2", oracle=_OLS2_ORACLE)
def q_ml_ols2(spark, d):
    """Two-feature OLS per group (price ~ quantity + discount):
    the 3x3 normal-equation system solved by Cramer's rule on NINE
    exact decimal moments from ONE combinable hash agg — extending
    q_ml_linear_ols's mirroring to multivariate regression. The
    determinant expressions are the same text on both engines
    (identical IEEE evaluation order), and coefficients leave as
    micro-quantized BIGINT per the r8 output policy. Scale shape
    unchanged: moments shrink map-side, the solve is per-group O(1)."""
    # shared memoized moment scan (ml.li_ols_moments) — identical
    # decimal sums under canonical names, remapped to this query's
    # s1/s2/s11/... aliases
    from .ml import li_ols_moments

    sums = li_ols_moments(spark, d).select(
        "l_returnflag",
        "n",
        F.col("sx").alias("s1"),
        F.col("sd").alias("s2"),
        "sy",
        F.col("sxx").alias("s11"),
        F.col("sxd").alias("s12"),
        F.col("sdd").alias("s22"),
        F.col("sxy").alias("s1y"),
        F.col("sdy").alias("s2y"),
    )
    return sums.select(
        "l_returnflag",
        "n",
        F.expr(f"cast(round({_D0} / {_D} * 1000000.0d) as bigint)").alias(
            "intercept_micro"
        ),
        F.expr(f"cast(round({_D1} / {_D} * 1000000.0d) as bigint)").alias(
            "beta_qty_micro"
        ),
        F.expr(f"cast(round({_D2} / {_D} * 1000000.0d) as bigint)").alias(
            "beta_disc_micro"
        ),
    ).orderBy("l_returnflag")
