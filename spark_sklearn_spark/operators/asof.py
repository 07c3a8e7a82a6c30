"""As-of join — Spark lacks a native one (SURVEY.md §4.3).

Strategy (the 100 TB-safe one): tag both sides, UNION them, shuffle
ONCE on the partition key, sort within partitions by (time, side,
tiebreak), and carry the most recent right-side row forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

This is O(n log n) per key with a single exchange, versus the naive
equi-join + filter + row_number approach which materializes every
(left, right-candidates) pair — quadratic per key over time and a
skew bomb for hot keys. The window emulation is the documented oracle
form (SURVEY.md §2B q_join_asof), so DuckDB's row_number emulation
checks the same semantics via a different algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction='backward'), matching on ``on``.

    value_cols: right-side columns to carry, returned with an
    ``asof_`` prefix. Ties on right.ts resolve to the greatest
    ``tiebreak`` value. Left rows with no match keep nulls.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    r_types = dict(right.dtypes)
    tb_type = r_types.get(tiebreak)
    if tb_type not in ("tinyint", "smallint", "int", "bigint"):
        # A silent cast("long") would turn e.g. a string tiebreak into
        # NULLs and make right-side ts-tie resolution nondeterministic.
        raise TypeError(
            f"asof_join tiebreak column {tiebreak!r} must be an integer "
            f"type (got {tb_type!r}); cast it explicitly or pick an "
            "orderable integer key"
        )
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")

    l_proj = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        l_struct,
        *[F.lit(None).cast(r_types[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_proj = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).cast("long").alias("__tb"),
        F.lit(None).cast(l_proj.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l_proj.unionByName(r_proj)

    # One shuffle on the key; in-partition sort puts right rows before
    # left rows at equal timestamps (inclusive as-of) and resolves
    # right-side ts ties by greatest tiebreak.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )
