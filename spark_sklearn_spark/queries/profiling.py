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
               ROUND(min(v), 6) AS vmin,
               ROUND(max(v), 6) AS vmax,
               ROUND(CAST(sum(CAST(v AS DECIMAL(30,10)) * cnt) AS DOUBLE)
                     / sum(CASE WHEN v IS NOT NULL THEN cnt ELSE 0 END), 6)
                   AS vmean
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
    mean = decimal Σ(v·cnt)/Σcnt). This deliberately avoids Spark's
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
            F.round(F.min("v"), 6).alias("vmin"),
            F.round(F.max("v"), 6).alias("vmax"),
            F.round(
                F.sum(F.col("v").cast(DEC) * F.col("cnt")).cast("double")
                / F.sum(
                    F.when(F.col("v").isNotNull(), F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                ),
                6,
            ).alias("vmean"),
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
