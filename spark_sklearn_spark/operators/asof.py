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

Directions (mirroring DuckDB/pandas merge_asof, VERDICT r2 item 6):
- ``backward`` — latest right row with right.ts <= left.ts,
- ``forward`` — earliest right row with right.ts >= left.ts (the same
  scan run in descending time order),
- ``nearest`` — whichever of the two is closer in time; equal
  distances resolve to the backward match (documented tie rule).
``allow_exact_matches=False`` makes the comparisons strict (< / >) by
flipping the side order at equal timestamps. Both directional scans
share one exchange — the ``nearest`` plan is shuffle-once, sort-twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the as-of matching right row.

    value_cols: right-side columns to carry, returned with an
    ``asof_`` prefix. Ties on right.ts resolve to the greatest
    ``tiebreak`` value (in every direction). Left rows with no match
    keep nulls.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")

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

    # One shuffle on the key; the in-partition sort puts right rows
    # before left rows at equal timestamps when exact matches are
    # allowed (inclusive as-of) — after them when they are not — and
    # resolves right-side ts ties by greatest tiebreak. ``backward``
    # scans time ascending, ``forward`` scans it descending; the
    # carried __mt (matched right timestamp) feeds nearest's choice.
    def scan(backward: bool):
        t_ord = F.col("__t").asc() if backward else F.col("__t").desc()
        side_ord = (
            F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
        )
        w = (
            Window.partitionBy("__k")
            .orderBy(t_ord, side_ord, F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tag = "b" if backward else "f"
        vals = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__{tag}_{c}")
            for c in value_cols
        ]
        mt = (
            F.last(
                F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
            )
            .over(w)
            .alias(f"__mt_{tag}")
        )
        return [*vals, mt]

    if direction == "backward":
        filled = u.select("__side", "__lrow", *scan(backward=True))
        picked = [F.col(f"__b_{c}").alias(f"asof_{c}") for c in value_cols]
    elif direction == "forward":
        filled = u.select("__side", "__lrow", *scan(backward=False))
        picked = [F.col(f"__f_{c}").alias(f"asof_{c}") for c in value_cols]
    else:  # nearest: both scans share the exchange; pick per row
        filled = u.select(
            "__side", "__lrow", "__t", *scan(backward=True), *scan(backward=False)
        )
        # distances in integer units (microseconds / days / the raw
        # integer) — a double epoch would round at the last ulp and
        # could flip an equal-distance tie against an integer-math
        # oracle, and bigints past 2^53 would lose precision entirely
        ts_type = dict(left.dtypes).get(ts, "")

        def tnum(c):
            if ts_type.startswith("timestamp"):
                return F.unix_micros(c)
            if ts_type == "date":
                return F.unix_date(c)
            if ts_type in ("tinyint", "smallint", "int", "bigint"):
                return c.cast("long")
            if ts_type in ("float", "double"):
                return c.cast("double")
            raise TypeError(
                f"asof_join direction='nearest' needs an orderable "
                f"numeric/temporal ts column (got {ts!r}: {ts_type!r})"
            )

        d_b = tnum(F.col("__t")) - tnum(F.col("__mt_b"))
        d_f = tnum(F.col("__mt_f")) - tnum(F.col("__t"))
        pick_b = F.col("__mt_f").isNull() | (
            F.col("__mt_b").isNotNull() & (d_b <= d_f)
        )
        picked = [
            F.when(pick_b, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(f"asof_{c}")
            for c in value_cols
        ]

    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *picked,
    )
