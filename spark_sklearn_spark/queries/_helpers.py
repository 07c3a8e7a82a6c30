"""Shared helpers enforcing Spark↔DuckDB determinism (SURVEY.md §5.2.4).

Float policy: sums of doubles are order-dependent, and Spark and DuckDB
add in different orders (shuffle partitions vs segment trees). Both
engines, however, cast double→decimal with round-half-away-from-zero
and sum decimals exactly — so every "sum of doubles" in a declared
query is expressed as CAST → DECIMAL(30,10) → SUM (exact) → DOUBLE on
BOTH sides, making the result bit-identical and hash-stable. Remaining
true-float aggregates (stddev, corr, percentile) are rounded to 6
decimals on both sides.

Timestamp policy: parquet stores events.ts at ns; both engines read µs
(FIXTURES.md). Anything converted to epoch seconds goes through
date_trunc('second') first on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(30,10)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal-path sum of a double column, rounded to `scale`.

    Oracle-side mirror: ROUND(CAST(SUM(CAST(x AS DECIMAL(30,10))) AS
    DOUBLE), scale) AS alias.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), scale
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE), {scale})"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS {alias}"
    )


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds via date_trunc('second') — mirror with
    ``CAST(epoch(date_trunc('second', ts)) AS BIGINT)`` in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("second", c).cast("long")


# 56-bit portable hash: first 14 hex chars of md5 — Spark (conv base
# 16) and DuckDB ('0x'||…::BIGINT) produce the IDENTICAL value, inside
# whole-stage codegen (CLAUDE.md trap: this exact expression is the
# one proven cross-engine form; every query must build on these two
# helpers rather than re-typing it).

TWO56 = float(1 << 56)  # hash-space size, for uniform-in-(0,1] draws


def h56(expr: str) -> Column:
    """Spark md5-head hash of an arbitrary SQL expression string."""
    return F.expr(
        f"cast(conv(substr(md5({expr}), 1, 14), 16, 10) as bigint)"
    )


def sql_h56(expr: str) -> str:
    """DuckDB mirror of :func:`h56`."""
    return f"(('0x' || substr(md5({expr}), 1, 14))::BIGINT)"
