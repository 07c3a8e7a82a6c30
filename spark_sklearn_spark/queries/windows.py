"""Window-function queries (SURVEY.md §2B 'Window functions').

Every ORDER BY inside a window carries a unique tie-break key so
rank/row_number/ntile are deterministic in both engines. Windowed
sums go through the decimal path (_helpers): Spark evaluates running
frames incrementally while DuckDB uses segment trees — different
addition orders, identical decimal results.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC, epoch_seconds


@query(
    "q_win_rank",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(row_number() OVER w AS BIGINT) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark, d):
    """rank / dense_rank / row_number per customer by price."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return load(spark, d, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "q_win_analytic",
    oracle="""
        SELECT event_id,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               first_value(value) OVER w AS first_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_analytic(spark, d):
    """lag / lead / first_value per user ordered by time. Raw doubles
    pass through untouched — bit-exact in both engines."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, d, "events").select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
        SELECT event_id,
               CAST(SUM(CAST(value AS DECIMAL(30,10)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_total
        FROM events
    """,
)
def q_win_frame_rows(spark, d):
    """Running total with an explicit ROWS frame (decimal-exact)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, d, "events").select(
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@query(
    "q_win_frame_range",
    oracle="""
        SELECT event_id,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 6) AS avg_7d
        FROM (SELECT event_id, user_id, value,
                     CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY secs
                     RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_frame_range(spark, d):
    """7-day moving average per user with a RANGE frame over epoch
    seconds (ts → date_trunc('second') → epoch on BOTH sides, per
    FIXTURES.md ns/µs note)."""
    ev = load(spark, d, "events").withColumn("secs", epoch_seconds("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("secs")
        .rangeBetween(-7 * 86400, W.currentRow)
    )
    return ev.select(
        "event_id",
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("avg_7d"),
    )


@query(
    "q_win_ntile",
    oracle="""
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
                   AS quartile
        FROM customer
    """,
)
def q_win_ntile(spark, d):
    """ntile(4) quartiles of account balance, computed scale-safe: a
    histogram-bucketed two-pass global ranking (operators/ranking.py)
    instead of a single-partition Window.orderBy — every sort stays
    local to a ~n/256 bucket, matching native NTILE semantics exactly
    (verified against DuckDB's NTILE)."""
    from ..operators.ranking import distributed_ntile

    c = load(spark, d, "customer")
    return distributed_ntile(
        c.select("c_custkey", "c_acctbal"),
        "c_acctbal",
        ["c_custkey"],
        n_tiles=4,
        out_col="quartile",
    ).select("c_custkey", "quartile")


@query(
    "q_win_distribution",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_distribution(spark, d):
    """percent_rank + cume_dist per order-status partition — the
    distribution-analytic pair (rank-1)/(n-1) and rank_le/n. Values
    are small-integer ratios evaluated in double on both engines, so
    they agree bitwise before the round-6. Partitioned by status:
    no single-partition window."""
    o = load(spark, d, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_range_interval",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_last_2h,
               CAST(floor(CAST(sum(CAST(value AS DECIMAL(30,10)))
                               OVER w AS DOUBLE) * 100) AS BIGINT)
                   AS sum_last_2h_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
                               AND CURRENT ROW)
        ORDER BY event_id
    """,
)
def q_win_range_interval(spark, d):
    """TIME-based sliding frame: RANGE BETWEEN INTERVAL 2 HOURS
    PRECEDING — the rolling-window aggregate keyed by event TIME, not
    row count (a user with bursty traffic gets a wide frame, a sparse
    one a narrow frame; ROWS frames can't express this). One shuffle
    on user_id, sorted range-frame scan per partition; sums ride the
    exact decimal path inside the frame and leave as floor(x*100)
    integer cents. Identical frame semantics on
    both engines: RANGE over timestamps with an INTERVAL bound
    includes ties on ts."""
    from ..sources.io import register_views

    register_views(spark, d, tables=["events"])
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               count(*) OVER w AS n_last_2h,
               CAST(floor(CAST(sum(CAST(value AS DECIMAL(30,10)))
                               OVER w AS DOUBLE) * 100) AS BIGINT)
                   AS sum_last_2h_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                               AND CURRENT ROW)
        ORDER BY event_id
        """
    )


@query(
    "q_win_nth",
    oracle="""
        SELECT DISTINCT user_id,
               nth_value(event_id, 2) OVER w AS second_event,
               last_value(event_id) OVER w AS last_event,
               CAST(count(*) OVER w AS BIGINT) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ORDER BY user_id
    """,
)
def q_win_nth(spark, d):
    """nth_value / last_value over an UNBOUNDED-to-UNBOUNDED frame —
    the per-entity "second touchpoint / final touchpoint" attribution
    view. The full frame matters: with the default frame (unbounded
    preceding → current row) last_value degenerates to the current
    row, a classic silent-wrong-answer; both engines here declare the
    whole-partition frame explicitly. DISTINCT collapses the
    per-event duplication to one row per user JVM-side; ordering
    carries the (ts, event_id) total-order tie-break."""
    from ..sources.io import register_views

    register_views(spark, d, tables=["events"])
    return spark.sql(
        """
        SELECT DISTINCT user_id,
               nth_value(event_id, 2) OVER w AS second_event,
               last_value(event_id) OVER w AS last_event,
               count(*) OVER w AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ORDER BY user_id
        """
    )


@query(
    "q_win_pct_change",
    oracle="""
        WITH daily AS (
          SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                            AS DOUBLE), 2) AS revenue
          FROM orders
          GROUP BY day
        )
        SELECT day, revenue,
               CAST(floor((revenue - lag(revenue) OVER (ORDER BY day))
                          / lag(revenue) OVER (ORDER BY day) * 1000000)
                    AS BIGINT) AS pct_change_micro,
               CAST(floor(CAST(SUM(CAST(revenue AS DECIMAL(30,10)))
                               OVER (ORDER BY day
                                     ROWS BETWEEN 6 PRECEDING
                                              AND CURRENT ROW)
                               AS DOUBLE)
                          / COUNT(*) OVER (ORDER BY day
                                     ROWS BETWEEN 6 PRECEDING
                                              AND CURRENT ROW)
                          * 1000000) AS BIGINT) AS ma7_micro
        FROM daily
        ORDER BY day
    """,
)
def q_win_pct_change(spark, d):
    """Period-over-period: daily revenue with day-over-day percent
    change and a 7-day moving average — the BI time-series triple.
    The fact stream first collapses to the DAY grain (combinable agg:
    100 TB in, one row per calendar day out), so the ordered window
    that follows runs on a calendar-BOUNDED relation — the same
    single-partition-is-safe argument as q_win_pareto's top-100.
    Daily sums are rounded on the decimal path BEFORE the derived
    metrics (2-dp money — ROUND-safe); pct-change and the moving
    average leave as floor(x*1e6) integer micro."""
    from pyspark.sql import Window as W

    o = load(spark, d, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2
        ).alias("revenue")
    )
    w_ord = W.orderBy("day")
    w_ma = W.orderBy("day").rowsBetween(-6, 0)
    prev = F.lag("revenue").over(w_ord)
    return daily.select(
        "day",
        "revenue",
        F.floor(
            (F.col("revenue") - prev) / prev * 1000000
        ).alias("pct_change_micro"),
        F.floor(
            F.sum(F.col("revenue").cast(DEC)).over(w_ma).cast("double")
            / F.count(F.lit(1)).over(w_ma)
            * 1000000
        ).alias("ma7_micro"),
    ).orderBy("day")


@query(
    "q_win_ignore_nulls",
    oracle="""
        WITH readings AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
          FROM events
        )
        SELECT user_id, event_id,
               CAST(floor(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) * 1000000) AS BIGINT)
                   AS last_known_micro,
               CAST(floor(first_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) * 1000000) AS BIGINT)
                   AS first_known_micro
        FROM readings
        ORDER BY user_id, event_id
    """,
)
def q_win_ignore_nulls(spark, d):
    """IGNORE NULLS window semantics: last/first non-null reading as
    of each row — the carry-forward every sensor/telemetry pipeline
    leans on when a stream drops values (NULLs injected on every
    third event_id to exercise it; unlike q_ts_gapfill this is the
    WINDOW-function form, one pass with no self-join). Both frames
    share a single (user_id; ts, event_id) partitioning — one
    shuffle, one sort; carried values leave as floor(x*1e6) integer
    micro (the carried double is identical on both engines)."""
    from pyspark.sql import Window as W

    ev = load(spark, d, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.floor(
            F.last("v", ignorenulls=True).over(w) * 1000000
        ).alias("last_known_micro"),
        F.floor(
            F.first("v", ignorenulls=True).over(w) * 1000000
        ).alias("first_known_micro"),
    ).orderBy("user_id", "event_id")
