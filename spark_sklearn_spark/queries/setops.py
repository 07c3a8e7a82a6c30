"""Set operations (SURVEY.md §2B 'Set operations')."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


def _slice(spark, d, etype):
    return (
        load(spark, d, "events")
        .filter(F.col("event_type") == etype)
        .select("user_id", "event_type")
    )


@query(
    "q_set_union",
    oracle="""
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT user_id, event_type FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
        )
        GROUP BY user_id, event_type
    """,
)
def q_set_union(spark, d):
    """UNION ALL (bag semantics) + aggregation on top."""
    u = _slice(spark, d, "click").unionByName(_slice(spark, d, "purchase"))
    return u.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_set_union_distinct",
    oracle="""
        SELECT user_id, event_type FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_union_distinct(spark, d):
    """UNION with set semantics (dedup via shuffle on all columns)."""
    return _slice(spark, d, "click").union(_slice(spark, d, "purchase")).distinct()


@query(
    "q_set_intersect",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_intersect(spark, d):
    """Users who both clicked and purchased."""
    a = _slice(spark, d, "click").select("user_id")
    b = _slice(spark, d, "purchase").select("user_id")
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_except(spark, d):
    """(user, day) pairs with a view but no purchase that day (EXCEPT
    DISTINCT). Keyed at day grain so the result is non-empty at every
    sf — every user eventually purchases at least once overall."""
    ev = load(spark, d, "events").withColumn("day", F.date_trunc("day", "ts"))
    a = ev.filter(F.col("event_type") == "view").select("user_id", "day")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", "day")
    return a.subtract(b)
