"""Data profiling & dataset splitting (round 5): the ANALYZE-style
column profiler and the deterministic train/val/test split.

Profiling is the first pass any pipeline runs on a new drop (nulls,
cardinalities, ranges decide every downstream cleaning rule); the
hash split is the last (and must be reproducible across engines,
reruns, and repartitioning — which rules out df.randomSplit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ._helpers import DEC

# --------------------------------------------------------------------------
# Column profiler
# --------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "q_profile_table",
    oracle=f"""
        WITH long AS (
          {" UNION ALL ".join(
              f"SELECT '{c}' AS column_name, {c} AS v FROM lineitem"
              for c in _PROFILE_COLS
          )}
        ), g AS (
          SELECT column_name, v, count(*) AS cnt FROM long GROUP BY 1, 2
        )
        SELECT column_name,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(count(v) AS BIGINT) AS n_distinct,
               CAST(floor(min(v) * 1000000) AS BIGINT) AS vmin_micro,
               CAST(floor(max(v) * 1000000) AS BIGINT) AS vmax_micro,
               CAST(floor(CAST(sum(CAST(v AS DECIMAL(30,10)) * cnt)
                               AS DOUBLE)
                          / sum(CASE WHEN v IS NOT NULL THEN cnt
                                     ELSE 0 END) * 1000000) AS BIGINT)
                   AS vmean_micro
        FROM g GROUP BY column_name
        ORDER BY column_name
    """,
)
def q_profile_table(spark, d):
    """ANALYZE-style column profiler: null count, exact distinct
    count, min/max, mean per profiled column, one output row per
    column. Shape: ONE scan stacks the profiled columns into a
    (column_name, value) long stream — a Generate, no extra pass —
    then TWO combinable hash aggregations: (column, value) -> count
    collapses to the distinct values (this is where exact ndv comes
    from, with map-side combine doing the heavy lifting), and a
    ~|distinct|-row rollup per column derives every statistic from
    the value-count pairs (n = Σcnt, nulls = Σcnt over null values,
    mean = decimal Σ(v·cnt)/Σcnt); min/max/mean leave as
    floor(x*1e6) integer micro. This deliberately avoids Spark's
    expand-based multi-distinct (n_cols× row multiplication through a
    single-partition final agg — measured ~4× slower at sf0.1) and
    never funnels full rows through one partition. At 100 TB swap
    exact ndv for approx_count_distinct when the profile feeds humans
    instead of a declared-equality check."""
    li = load(spark, d, "lineitem")
    stack_args = ", ".join(f"'{c}', {c}" for c in _PROFILE_COLS)
    long = li.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, v)"
        )
    )
    g = long.groupBy("column_name", "v").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        g.groupBy("column_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(
                F.when(F.col("v").isNull(), F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_null"),
            F.count("v").alias("n_distinct"),
            F.floor(F.min("v") * 1000000).alias("vmin_micro"),
            F.floor(F.max("v") * 1000000).alias("vmax_micro"),
            F.floor(
                F.sum(F.col("v").cast(DEC) * F.col("cnt")).cast("double")
                / F.sum(
                    F.when(F.col("v").isNotNull(), F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                )
                * 1000000
            ).alias("vmean_micro"),
        )
        .orderBy("column_name")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------

# Knuth multiplicative hash (the q_sample_hash idiom) on the stable
# doc key; split at 80/10/10 of the 2^32 hash space.
_SPLIT_T1 = int(0.8 * 4294967296)
_SPLIT_T2 = int(0.9 * 4294967296)


@query(
    "q_split_train",
    oracle=f"""
        WITH h AS (
          SELECT doc_id, lang, n_chars,
                 (doc_id * 2654435761) % 4294967296 AS hv
          FROM documents
        )
        SELECT CASE WHEN hv < {_SPLIT_T1} THEN 'train'
                    WHEN hv < {_SPLIT_T2} THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS sum_ids,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT lang) AS n_langs
        FROM h
        GROUP BY 1
        ORDER BY split
    """,
)
def q_split_train(spark, d):
    """Deterministic 80/10/10 train/val/test split via the Knuth
    multiplicative key hash — the property df.randomSplit cannot give
    you: the SAME document lands in the SAME split on any engine, any
    partitioning, any rerun, and membership is decidable per-row with
    zero coordination (a pure codegen'd CASE over one multiply-mod).
    sum_ids pins the exact membership, not just the counts, so the
    declared check would catch a single strayed document. One scan,
    one 3-group combinable agg."""
    docs = load(spark, d, "documents")
    hv = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    split = (
        F.when(hv < _SPLIT_T1, "train")
        .when(hv < _SPLIT_T2, "val")
        .otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Pairwise correlation matrix (exact-moment Pearson)
# --------------------------------------------------------------------------

_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]


def _corr_oracle() -> str:
    cols = sorted({c for p in _CORR_PAIRS for c in p})
    moments = ["COUNT(*) AS n"]
    for c in cols:
        moments.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(30,10))) AS DOUBLE) AS s_{c}"
        )
        moments.append(
            f"CAST(SUM(CAST({c} * {c} AS DECIMAL(30,10))) AS DOUBLE) AS q_{c}"
        )
    for a, b in _CORR_PAIRS:
        moments.append(
            f"CAST(SUM(CAST({a} * {b} AS DECIMAL(30,10))) AS DOUBLE)"
            f" AS p_{a}_{b}"
        )
    selects = []
    for a, b in _CORR_PAIRS:
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"ROUND((n * p_{a}_{b} - s_{a} * s_{b}) / "
            f"sqrt((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b})), 6)"
            f" AS corr, n FROM m"
        )
    return (
        "WITH m AS (SELECT "
        + ", ".join(moments)
        + " FROM lineitem) "
        + " UNION ALL ".join(selects)
        + " ORDER BY col_a, col_b"
    )


@query("q_profile_corr", oracle=_corr_oracle())
def q_profile_corr(spark, d):
    """Pairwise Pearson correlation matrix over the numeric lineitem
    measures — the profiling pass that decides feature redundancy
    before training. Built-in corr() is a float aggregation whose
    partial-merge order differs between engines, so this computes
    corr from EXACT decimal raw-moment sums instead (n, Σx, Σx²,
    Σxy — the same trick as q_agg_moments): products are IEEE-
    deterministic per row, the decimal sums are order-independent,
    and the closing formula is an identical double expression on both
    sides, rounded to 6. ONE scan + ONE combinable hash aggregate
    produces all 15 moments (map-side partials; the shuffle carries a
    single row of decimals); the 6-pair matrix is then a stack over
    that one row — at 100 TB this is a full-scan → KB reduction.
    spread=True parallelizes the 15 decimal partial sums across cores
    (r17: the 1-row-group fixture ran them in one task — 4.1 s → 1.1 s
    at sf0.1; no-op on splittable production inputs)."""
    cols = sorted({c for p in _CORR_PAIRS for c in p})
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(DEC)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(DEC))
            .cast("double")
            .alias(f"q_{c}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast(DEC))
            .cast("double")
            .alias(f"p_{a}_{b}")
        )
    m = load(spark, d, "lineitem", spread=True).agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', round((n * p_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b})), 6)"
        for a, b in _CORR_PAIRS
    )
    return (
        m.select(
            F.expr(
                f"stack({len(_CORR_PAIRS)}, {stack_args}) "
                "AS (col_a, col_b, corr)"
            ),
            "n",
        )
        .orderBy("col_a", "col_b")
    )
