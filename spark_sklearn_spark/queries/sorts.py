"""Sorts / limits / top-k (SURVEY.md §2B).

Global top-k compiles to TakeOrderedAndProject — per-partition heaps
plus a driver-side merge of k rows, never a full global sort. Per-
group top-k uses a window + filter, shuffling once on the group key.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..registry import query
from ..sources.io import load


@query(
    "q_sort_multi",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_totalprice > 490000
        ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC,
                 o_orderkey
    """,
)
def q_sort_multi(spark, d):
    """Multi-key sort with explicit null ordering."""
    return (
        load(spark, d, "orders")
        .filter(F.col("o_totalprice") > 490000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
    )


@query(
    "q_topk_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def q_topk_limit(spark, d):
    """Global top-10 with a unique tie-break (deterministic LIMIT)."""
    return (
        load(spark, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_extendedprice DESC,
                                               l_linenumber) AS rn
            FROM lineitem
        )
        WHERE rn <= 3
    """,
)
def q_topk_per_group(spark, d):
    """Top-3 lineitems per order by price."""
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return (
        load(spark, d, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
