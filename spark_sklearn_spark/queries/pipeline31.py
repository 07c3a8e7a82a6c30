"""Round-13 batch: Yule–Simon fit, piecewise trend, Leiden refinement.

Three operators extending the behavior/ts/graph families (VERDICT r12
item 8 named all three as the natural next keys):

- q_behavior_yule_simon: cumulative-advantage (preferential
  attachment) fit of per-user activity — the generative twin of
  q_behavior_powerlaw's Hill tail exponent. Method-of-moments on the
  Yule–Simon distribution keeps the WHOLE fit in exact integer
  rationals: ρ̂ = S/(S−n), P(1) = S/(2S−n).
- q_ts_piecewise_trend: single-breakpoint segmented OLS over the
  daily event series (the piecewise-linear trend primitive under
  Prophet-style changepoint models) — every candidate split scored
  in closed form from prefix-sum moments, no per-candidate rescan.
- q_graph_leiden_refine: the local-move refinement diagnostic from
  the Leiden algorithm (Traag, Waltman & van Eck 2019, "From Louvain
  to Leiden"), applied after ONE min-label superstep over the
  memoized near-dup edge snapshot: for each node, is it better
  edge-attached to a neighboring community than to its own? The
  gain histogram measures partition instability — all zero/negative
  gains ⇔ the refinement pass has converged locally.

Reference parity: the public repo (databricks/spark-sklearn 0.3.0)
has no relational/graph engine — these extend the §2B extension
surface, cited against the public semantics they mirror (Yule 1925 /
Simon 1955 preferential attachment; segmented regression; the Leiden
refinement phase) re-expressed as Spark DataFrame/SQL plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load

# --------------------------------------------------------------------------
# Yule–Simon (cumulative-advantage) fit of per-user activity
# --------------------------------------------------------------------------
#
# Preferential attachment with innovation produces the Yule–Simon law
# p(k) = ρ·B(k, ρ+1) ~ k^-(ρ+1); its mean is ρ/(ρ-1), so the
# method-of-moments estimate from n users and S events is
# ρ̂ = m/(m-1) = S/(S-n) — an exact integer rational, no logs. The
# head-probability check P(1) = ρ̂/(ρ̂+1) = S/(2S-n) against the
# observed singleton share f1/n tests the generative story where the
# tail exponent alone (q_behavior_powerlaw) cannot: a corpus can be
# Pareto-tailed without being preferential-attachment shaped.
# int64 headroom: S·1e6 crosses 2^63 near S ≈ 9.2e12 events — far
# past any single-table fixture; past that, compute in DECIMAL.

_YS_ORACLE = """
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(x) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           CAST(CAST(SUM(x) AS BIGINT) * 1000000
                // NULLIF(CAST(SUM(x) AS BIGINT) - COUNT(*), 0)
                AS BIGINT) AS rho_micro,
           CAST(CAST(SUM(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // COUNT(*) AS BIGINT) AS p1_obs_ppm,
           CAST(CAST(SUM(x) AS BIGINT) * 1000000
                // NULLIF(2 * CAST(SUM(x) AS BIGINT) - COUNT(*), 0)
                AS BIGINT) AS p1_pred_ppm
    FROM per_user
"""


@query("q_behavior_yule_simon", oracle=_YS_ORACLE)
def q_behavior_yule_simon(spark, d):
    """Yule–Simon cumulative-advantage fit (module comment): one
    per-user collapse, one global agg — every output an exact
    integer rational (floor-ppm via native integer division, the
    Spark `div` / DuckDB `//` pinned pair; NULLIF guards the
    degenerate all-singletons corpus on both engines).

    Shape: the user-grain agg is the only corpus shuffle; the global
    agg's SinglePartition exchange holds the post-aggregation 1-row
    relation (GLOBAL_VERDICT exemption class)."""
    ev = load(spark, d, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.when(F.col("x") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
    ).selectExpr(
        "n AS n_users",
        "s AS n_events",
        "f1 AS n_singletons",
        "s * 1000000L div nullif(s - n, 0) AS rho_micro",
        "f1 * 1000000L div n AS p1_obs_ppm",
        "s * 1000000L div nullif(2 * s - n, 0) AS p1_pred_ppm",
    )


# --------------------------------------------------------------------------
# Single-breakpoint piecewise (segmented) linear trend
# --------------------------------------------------------------------------
#
# The trend primitive under Prophet-style changepoint models: fit
# y = a + b·t to the daily event-count series with ONE free
# breakpoint, chosen to minimize total SSE. Every candidate split c
# (left = first c days, right = rest) scores in CLOSED FORM from
# prefix-sum moments (Σ1, Σi, Σy, Σiy, Σii, Σyy at each row; right
# moments = totals − prefix), so the 27-candidate scan costs one
# window pass — never a per-candidate rescan. All moment inputs are
# exact BIGINTs < 2^53 (i ≤ n_days, y = daily counts), so the SSE
# doubles are identical IEEE on both engines; SSE is milli-quantized
# BEFORE the argmin (ties break on the earlier day), per the
# round-6-floats convention. ONE SQL text runs on both engines (the
# q_ts_cusum posture); window SUMs are CAST to BIGINT at every step
# (DuckDB HUGEINT parity).
#
# Scale: the corpus collapses to the calendar-bounded daily grain in
# one combinable agg; the prefix window + candidate scoring run on
# that bounded relation (GLOBAL_WINDOW_BOUNDED exemption); the 1-row
# totals CROSS JOIN is the sanctioned Lloyd-shape broadcast.

_PW_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
    ),
    idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             day, y
      FROM daily
    ),
    pre AS (
      SELECT i, day, y,
             CAST(SUM(i) OVER w AS BIGINT) AS st,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(i * y) OVER w AS BIGINT) AS sty,
             CAST(SUM(i * i) OVER w AS BIGINT) AS stt,
             CAST(SUM(y * y) OVER w AS BIGINT) AS syy
      FROM idx
      WINDOW w AS (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(MAX(i) AS BIGINT) AS n,
             CAST(MAX(st) AS BIGINT) AS tst,
             CAST(MAX(sy) AS BIGINT) AS tsy,
             CAST(MAX(sty) AS BIGINT) AS tsty,
             CAST(MAX(stt) AS BIGINT) AS tstt,
             CAST(MAX(syy) AS BIGINT) AS tsyy
      FROM pre
    ),
    scored AS (
      SELECT p.i AS c, p.day, t.n,
             (CAST(p.syy AS DOUBLE)
              - CAST(p.sy AS DOUBLE) * p.sy / p.i)
             - (CAST(p.sty AS DOUBLE)
                - CAST(p.st AS DOUBLE) * p.sy / p.i)
               * (CAST(p.sty AS DOUBLE)
                  - CAST(p.st AS DOUBLE) * p.sy / p.i)
               / (CAST(p.stt AS DOUBLE)
                  - CAST(p.st AS DOUBLE) * p.st / p.i) AS sse_l,
             (CAST(t.tsyy - p.syy AS DOUBLE)
              - CAST(t.tsy - p.sy AS DOUBLE) * (t.tsy - p.sy)
                / (t.n - p.i))
             - (CAST(t.tsty - p.sty AS DOUBLE)
                - CAST(t.tst - p.st AS DOUBLE) * (t.tsy - p.sy)
                  / (t.n - p.i))
               * (CAST(t.tsty - p.sty AS DOUBLE)
                  - CAST(t.tst - p.st AS DOUBLE) * (t.tsy - p.sy)
                    / (t.n - p.i))
               / (CAST(t.tstt - p.stt AS DOUBLE)
                  - CAST(t.tst - p.st AS DOUBLE) * (t.tst - p.st)
                    / (t.n - p.i)) AS sse_r,
             (CAST(p.sty AS DOUBLE)
              - CAST(p.st AS DOUBLE) * p.sy / p.i)
             / (CAST(p.stt AS DOUBLE)
                - CAST(p.st AS DOUBLE) * p.st / p.i) AS b_l,
             (CAST(t.tsty - p.sty AS DOUBLE)
              - CAST(t.tst - p.st AS DOUBLE) * (t.tsy - p.sy)
                / (t.n - p.i))
             / (CAST(t.tstt - p.stt AS DOUBLE)
                - CAST(t.tst - p.st AS DOUBLE) * (t.tst - p.st)
                  / (t.n - p.i)) AS b_r,
             (CAST(t.tsyy AS DOUBLE)
              - CAST(t.tsy AS DOUBLE) * t.tsy / t.n)
             - (CAST(t.tsty AS DOUBLE)
                - CAST(t.tst AS DOUBLE) * t.tsy / t.n)
               * (CAST(t.tsty AS DOUBLE)
                  - CAST(t.tst AS DOUBLE) * t.tsy / t.n)
               / (CAST(t.tstt AS DOUBLE)
                  - CAST(t.tst AS DOUBLE) * t.tst / t.n) AS sse_tot
      FROM pre p CROSS JOIN tot t
      WHERE p.i >= 2 AND p.i <= t.n - 2
    ),
    pick AS (
      SELECT c, day, n,
             CAST(floor((sse_l + sse_r) * 1000) AS BIGINT)
                 AS sse_split_milli,
             CAST(floor(sse_tot * 1000) AS BIGINT) AS sse_single_milli,
             CAST(floor(b_l * 1000000) AS BIGINT) AS slope_left_micro,
             CAST(floor(b_r * 1000000) AS BIGINT) AS slope_right_micro,
             CAST(floor((1.0 - (sse_l + sse_r)
                               / NULLIF(sse_tot, CAST(0 AS DOUBLE)))
                        * 1000000) AS BIGINT) AS sse_gain_ppm
      FROM scored
      ORDER BY CAST(floor((sse_l + sse_r) * 1000) AS BIGINT), c
      LIMIT 1
    )
    SELECT n AS n_days, c AS break_i, day AS break_day,
           slope_left_micro, slope_right_micro,
           sse_split_milli, sse_single_milli, sse_gain_ppm
    FROM pick
"""


@query("q_ts_piecewise_trend", oracle=_PW_SQL)
def q_ts_piecewise_trend(spark, d):
    """Single-breakpoint segmented OLS on the daily event series
    (module comment): one calendar collapse, one prefix-moment
    window over the bounded daily relation, closed-form SSE per
    candidate, milli-quantized argmin with earlier-day tie-break.
    One SQL text runs verbatim on both engines."""
    from ..sources.io import register_views

    register_views(spark, d, ["events"])
    return spark.sql(_PW_SQL)


# --------------------------------------------------------------------------
# Leiden-style refinement gain over the near-dup community graph
# --------------------------------------------------------------------------
#
# The Leiden algorithm's key addition over Louvain is the REFINEMENT
# phase: re-examine every node's assignment with local moves before
# aggregating communities. This operator runs that diagnostic after
# ONE min-label superstep (l1(v) = min(v, min neighbor) — the first
# round of q_graph_label_prop, deliberately unconverged so
# cross-community edges exist): for each node, compare its edge
# attachment a(v, own community) against its best alternative
# max_{M≠L} a(v, M). gain = best_alt − own > 0 marks a node the
# refinement pass would move; the gain histogram (bounded by max
# degree) measures partition instability in one number per level.
# Pure edge-count gain (CPM with γ → 0) — the degree-product
# modularity correction is deliberately dropped to keep every value
# an exact integer (documented deviation from the paper's CPM).


def _leiden_oracle() -> str:
    from .pipeline2 import _BIGRAMS_SQL

    return f"""
        WITH {_BIGRAMS_SQL},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        ),
        edges0 AS MATERIALIZED (
            SELECT i.doc_a, i.doc_b
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            WHERE ROUND(i.c * 1.0 / (sa.n + sb.n - i.c), 6) >= 0.4
        ),
        sym AS MATERIALIZED (
          SELECT doc_a AS src, doc_b AS dst FROM edges0
          UNION ALL
          SELECT doc_b, doc_a FROM edges0
        ),
        l1 AS MATERIALIZED (
          SELECT src AS doc_id,
                 least(src, MIN(dst)) AS l
          FROM sym GROUP BY src
        ),
        attach AS MATERIALIZED (
          SELECT s.src AS v, lb.l AS m, CAST(COUNT(*) AS BIGINT) AS a
          FROM sym s JOIN l1 lb ON lb.doc_id = s.dst
          GROUP BY s.src, lb.l
        ),
        own AS (
          SELECT a.v, a.a AS own
          FROM attach a JOIN l1 ON l1.doc_id = a.v AND a.m = l1.l
        ),
        alt AS (
          SELECT a.v, CAST(MAX(a.a) AS BIGINT) AS alt
          FROM attach a JOIN l1 ON l1.doc_id = a.v AND a.m <> l1.l
          GROUP BY a.v
        ),
        gains AS (
          SELECT n.doc_id,
                 COALESCE(al.alt, 0) - COALESCE(o.own, 0) AS gain
          FROM l1 n
          LEFT JOIN own o ON o.v = n.doc_id
          LEFT JOIN alt al ON al.v = n.doc_id
        )
        SELECT CAST(gain AS BIGINT) AS gain,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM gains GROUP BY gain ORDER BY gain
    """


# ROUND-safe: the only ROUND is the driver-PROVEN q_dedup_ngram edge
# predicate (pass r4) shared by the whole near-dup graph family.
@query("q_graph_leiden_refine", oracle=_leiden_oracle())
def q_graph_leiden_refine(spark, d):
    """Leiden refinement-phase gain histogram (module comment) over
    the memoized near-dup edge snapshot: one min-label superstep,
    one (node, neighbor-label) attachment agg, two bounded label
    lookups, a gain histogram. Every join is keyed on doc/node ids
    (unbounded parallelism); the histogram group-by key is the gain
    level (degree-bounded domain, post-aggregation)."""
    e = near_dup_sym(spark, d)
    l1 = e.groupBy("src").agg(
        F.least(F.col("src"), F.min("dst")).alias("l")
    ).withColumnRenamed("src", "doc_id")
    attach = (
        e.join(
            l1.select(F.col("doc_id").alias("dst"), F.col("l").alias("m")),
            "dst",
        )
        .groupBy(F.col("src").alias("v"), "m")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    own = (
        attach.join(l1.selectExpr("doc_id AS v", "l"), "v")
        .filter(F.col("m") == F.col("l"))
        .select("v", F.col("a").alias("own"))
    )
    alt = (
        attach.join(l1.selectExpr("doc_id AS v", "l"), "v")
        .filter(F.col("m") != F.col("l"))
        .groupBy("v")
        .agg(F.max("a").alias("alt"))
    )
    gains = (
        l1.selectExpr("doc_id AS v")
        .join(own, "v", "left")
        .join(alt, "v", "left")
        .select(
            (
                F.coalesce("alt", F.lit(0)) - F.coalesce("own", F.lit(0))
            ).alias("gain")
        )
    )
    return (
        gains.groupBy("gain")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("gain")
    )


def near_dup_sym(spark, d):
    """Symmetrized (src, dst) view of the memoized near-dup edge
    snapshot (pipeline2.near_dup_edges)."""
    from .pipeline2 import near_dup_edges

    e = near_dup_edges(spark, d).select("doc_a", "doc_b")
    return e.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        e.selectExpr("doc_b AS src", "doc_a AS dst")
    )
