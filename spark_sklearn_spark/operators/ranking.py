"""Distributed global ranking without a single-partition window
(SURVEY.md §2B q_win_ntile; VERDICT r1 'scale-killer' item).

``Window.orderBy(...)`` with no partition key funnels the entire table
through ONE task — the textbook non-scalable plan. This module
computes exact global row numbers with bounded parallelism instead:

1. value-histogram pass: fixed-width buckets over [min, max] — two
   tiny aggregations whose results (3 scalars + ≤``buckets`` counts)
   are the only driver-side data ever collected.
2. prefix-sum the bucket counts on the driver → per-bucket rank
   offset, shipped back as a literal map (small, broadcast with the
   plan).
3. in-bucket ``row_number()`` window partitioned BY BUCKET — each
   window partition holds ~n/buckets rows, so the sort is local and
   parallel — plus the bucket's offset = exact global rank.

Equal values always share a bucket (bucket is a pure function of the
value), so cross-bucket ordering is total; in-bucket ties resolve by
the caller's tiebreak columns. Deterministic: no sampling (unlike
repartitionByRange, whose sketch boundaries need not be stable across
jobs within one query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_global_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    buckets: int = 256,
    out_col: str = "__rn",
):
    """Exact global row_number ordered by (value_col, *tiebreak_cols).

    Returns (df_with_rn, total_count). Two tiny jobs run eagerly (the
    min/max/count scan and the histogram); the returned DataFrame
    stays lazy.
    """
    dtype0 = df.schema[value_col].dataType.simpleString()
    clean = (
        F.when(~F.isnan(F.col(value_col)), F.col(value_col))
        if dtype0 in ("float", "double")
        else F.col(value_col)
    )  # max(NaN-poisoned) would be NaN → NaN width → null buckets
    stats = df.agg(
        F.min(clean).alias("lo"),
        F.max(clean).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0 or lo is None:
        # empty input, or every value NULL: rank purely by tiebreaks
        lo, hi = 0.0, 0.0
    width = (hi - lo) / buckets if hi > lo else 1.0

    # NULLs rank first (Spark's ASC NULLS FIRST default): dedicated
    # bucket -1 ahead of every value bucket. NaNs sort GREATER than
    # every value in Spark/DuckDB ordering, but floor(NaN) would cast
    # to bucket 0 — route them to a dedicated last bucket instead.
    # (dtype0 gates BOTH the NaN-clean above and the NaN bucket here —
    # one variable so the two branches can't drift.)
    value_bucket = F.least(
        F.lit(buckets - 1), F.floor((F.col(value_col) - lo) / width)
    ).cast("int")
    if dtype0 in ("float", "double"):
        value_bucket = F.when(F.isnan(F.col(value_col)), F.lit(buckets)).otherwise(
            value_bucket
        )
    bucket_expr = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(value_bucket)
    hist = (
        df.groupBy(bucket_expr.alias("__bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = {r["__bucket"]: r["cnt"] for r in hist}
    offsets, acc = {}, 0
    for b in range(-1, buckets + 1):  # -1 = NULLs, buckets = NaNs
        offsets[b] = acc
        acc += counts.get(b, 0)

    offset_map = F.create_map(
        *[F.lit(x) for b in sorted(counts) for x in (b, offsets[b])]
    )
    w = Window.partitionBy("__bucket").orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    out = (
        df.withColumn("__bucket", bucket_expr)
        .withColumn(
            out_col,
            (offset_map[F.col("__bucket")] + F.row_number().over(w)).cast("long"),
        )
        .drop("__bucket")
    )
    return out, n


def _tile_expr(rn, n: int, n_tiles: int):
    """Exact NTILE(n) tile number from a 1-based global row number
    (first n%k tiles get the extra row)."""
    base, rem = divmod(n, n_tiles)
    if base == 0:
        return rn  # fewer rows than tiles: row i → tile i
    big = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)))
        .otherwise(rem + F.floor((rn - big - 1) / base))
        + 1
    )


def distributed_ntile(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    n_tiles: int,
    buckets: int = 256,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact NTILE(n) semantics (first n%k tiles get the extra row)
    from the distributed global row number."""
    ranked, n = with_global_row_number(df, value_col, tiebreak_cols, buckets)
    if n == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("long")).drop("__rn")
    tile = _tile_expr(F.col("__rn"), n, n_tiles)
    return ranked.withColumn(out_col, tile.cast("long")).drop("__rn")


def multi_distributed_ntile(
    df: DataFrame,
    specs: list[tuple[str, str]],
    tiebreak_cols: list[str],
    n_tiles: int,
    buckets: int = 256,
) -> DataFrame:
    """NTILE for SEVERAL value columns with two eager jobs total.

    ``specs`` is a list of (value_col, out_col). Column-by-column
    ``distributed_ntile`` runs its min/max/count + histogram pair per
    column (2k eager jobs for k tiles — q_behavior_rfm paid six);
    here ONE agg job carries every column's min/max and ONE stacked
    (col, bucket) histogram job carries every column's counts. The
    per-column bucket maps and in-bucket windows are unchanged, so
    tile assignments are identical to the sequential form (r17)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    dtypes: dict[str, str] = {}
    for vc, _ in specs:
        dt = df.schema[vc].dataType.simpleString()
        dtypes[vc] = dt
        clean = (
            F.when(~F.isnan(F.col(vc)), F.col(vc))
            if dt in ("float", "double")
            else F.col(vc)
        )
        aggs.append(F.min(clean).alias(f"__lo_{vc}"))
        aggs.append(F.max(clean).alias(f"__hi_{vc}"))
    stats = df.agg(*aggs).first()
    n = stats["__n"]

    bucket_exprs = {}
    for vc, _ in specs:
        lo, hi = stats[f"__lo_{vc}"], stats[f"__hi_{vc}"]
        if n == 0 or lo is None:
            lo, hi = 0.0, 0.0
        width = (hi - lo) / buckets if hi > lo else 1.0
        vb = F.least(
            F.lit(buckets - 1), F.floor((F.col(vc) - lo) / width)
        ).cast("int")
        if dtypes[vc] in ("float", "double"):
            vb = F.when(F.isnan(F.col(vc)), F.lit(buckets)).otherwise(vb)
        bucket_exprs[vc] = (
            F.when(F.col(vc).isNull(), F.lit(-1)).otherwise(vb)
        )

    hist = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("ci"),
                            bucket_exprs[vc].alias("b"),
                        )
                        for i, (vc, _) in enumerate(specs)
                    ]
                )
            ).alias("s")
        )
        .groupBy(F.col("s.ci").alias("ci"), F.col("s.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )

    out = df
    for i, (vc, oc) in enumerate(specs):
        if n == 0:
            out = out.withColumn(oc, F.lit(None).cast("long"))
            continue
        counts = {r["b"]: r["cnt"] for r in hist if r["ci"] == i}
        offsets, acc = {}, 0
        for b in range(-1, buckets + 1):
            offsets[b] = acc
            acc += counts.get(b, 0)
        offset_map = F.create_map(
            *[F.lit(x) for b in sorted(counts) for x in (b, offsets[b])]
        )
        w = Window.partitionBy("__bucket").orderBy(
            F.col(vc).asc(), *[F.col(c).asc() for c in tiebreak_cols]
        )
        rn = offset_map[F.col("__bucket")] + F.row_number().over(w)
        out = (
            out.withColumn("__bucket", bucket_exprs[vc])
            .withColumn(oc, _tile_expr(rn, n, n_tiles).cast("long"))
            .drop("__bucket")
        )
    return out
