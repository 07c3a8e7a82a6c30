"""Skew-mitigation helpers (SURVEY.md §4.3 '100 TB skew hygiene').

AQE's skew-join splitting is the first line of defense (enabled in
session.py); explicit salting is for aggregations and for joins whose
skew AQE can't see (e.g. a hot key produced mid-query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Add a deterministic salt column in [0, buckets)."""
    return df.withColumn(
        col_name, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: str, buckets: int, how: str = "inner"
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    ``buckets`` times, join on (key, salt). Use when one key dominates
    and the small side fits ``buckets``-fold replication."""
    b = with_salt(big, buckets)
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
