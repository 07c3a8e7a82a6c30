"""Scans / sources (SURVEY.md §2B 'Scans / sources / sinks').

All scans are plain parquet reads so Catalyst pushes predicates and
prunes columns down to the vectorized reader — verified via
``.explain`` (PushedFilters / ReadSchema) in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


@query(
    "q_scan_parquet",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
)
def q_scan_parquet(spark, d):
    """Full-table scan + count. At scale this is metadata-only for
    parquet (row-group counts), which is exactly what we want."""
    return load(spark, d, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_scan_projection",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def q_scan_projection(spark, d):
    """Column-pruned scan: ReadSchema must contain exactly two fields."""
    return load(spark, d, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "q_scan_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
    """,
)
def q_scan_pushdown(spark, d):
    """Filtered scan — predicate reaches parquet (row-group min/max
    skipping at scale)."""
    return (
        load(spark, d, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "q_source_json_props",
    oracle="""
        SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        FROM events
    """,
)
def q_source_json_props(spark, d):
    """JSON column parsing from events.props (semi-structured source)."""
    return load(spark, d, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "q_scan_metadata",
    oracle="""
        SELECT 'lineitem.parquet' AS file_name,
               count(*) AS n_rows,
               CAST(min(l_orderkey) AS BIGINT) AS min_key,
               CAST(max(l_orderkey) AS BIGINT) AS max_key
        FROM lineitem
        ORDER BY file_name
    """,
)
def q_scan_metadata(spark, d):
    """Hidden file-metadata columns (`_metadata.file_name`) — the
    lineage/debugging surface a lake pipeline uses to trace rows back
    to their source files (which ingest batch produced this row?
    which file is corrupt?). The metadata struct is populated by the
    scan itself at zero IO cost; grouping by file gives the per-file
    row-count/key-range audit that validates a compaction or backfill.
    One scan, one combinable agg on the (tiny) file-name key space."""
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"), "l_orderkey")
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        .orderBy("file_name")
    )
