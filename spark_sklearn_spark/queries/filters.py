"""Projection / filter / predicate queries (SURVEY.md §2B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


@query(
    "q_filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE ((l_quantity BETWEEN 10 AND 20) AND l_discount > 0.05)
           OR (NOT (l_returnflag IN ('A', 'R')) AND l_tax IS NOT NULL
               AND l_quantity > 45)
    """,
)
def q_filter_pred(spark, d):
    """Compound predicate: AND / OR / NOT / IN / BETWEEN / IS NULL."""
    li = load(spark, d, "lineitem")
    cond = (
        (F.col("l_quantity").between(10, 20) & (F.col("l_discount") > 0.05))
        | (
            ~F.col("l_returnflag").isin("A", "R")
            & F.col("l_tax").isNotNull()
            & (F.col("l_quantity") > 45)
        )
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@query(
    "q_project_expr",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
            CASE WHEN l_quantity < 10 THEN 'low'
                 WHEN l_quantity < 30 THEN 'mid'
                 ELSE 'high' END AS qty_band
        FROM lineitem
    """,
)
def q_project_expr(spark, d):
    """Arithmetic projection + CASE WHEN. The product of doubles is
    order-free (bitwise identical in both engines) — no ROUND: Spark
    rounds doubles via BigDecimal HALF_UP while DuckDB rounds the
    binary double, so they disagree at half-way points; the raw
    product hashes identically."""
    li = load(spark, d, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
    )


@query(
    "q_filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_type, p_brand
        FROM part
        WHERE (p_type LIKE 'M%' OR p_type LIKE '%ARD')
          AND regexp_matches(p_brand, 'Brand#1[0-9]$')
    """,
)
def q_filter_like(spark, d):
    """LIKE + regexp filters on strings."""
    p = load(spark, d, "part")
    return p.filter(
        (F.col("p_type").like("M%") | F.col("p_type").like("%ARD"))
        & F.col("p_brand").rlike("Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_type", "p_brand")
