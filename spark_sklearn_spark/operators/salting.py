"""Skew-mitigation helpers (SURVEY.md §4.3 '100 TB skew hygiene').

AQE's skew-join splitting is the first line of defense (enabled in
session.py); explicit salting is for aggregations and for joins whose
skew AQE can't see (e.g. a hot key produced mid-query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(
    df: DataFrame, buckets: int, salt_from: list[str], col_name: str = "__salt"
) -> DataFrame:
    """Add a deterministic, content-derived salt column in [0, buckets).

    The salt is ``pmod(xxhash64(*salt_from), buckets)`` — a pure
    function of row content, so it is stable across runs, plans, and
    partitionings (spark_partition_id/monotonically_increasing_id are
    NOT: they change with the physical layout). Pass high-cardinality
    columns in ``salt_from`` so the hot key's rows spread evenly."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets)).cast("int"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int,
    salt_from: list[str],
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    ``buckets`` times, join on (key, salt). Use when one key dominates
    and the small side fits ``buckets``-fold replication.

    Only inner/left are supported: right/full would count each
    unmatched small-side row ``buckets`` times (it was replicated),
    silently corrupting outer-join semantics."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "variants would duplicate unmatched replicated small-side rows"
        )
    b = with_salt(big, buckets, salt_from)
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
