"""Sketch-family invariants (round 7) — properties the DuckDB hash
check cannot see because both engines would violate them together:
count-min NEVER underestimates, Bloom has NO false negatives, HLL's
estimate lands within the theoretical error band, and the merged HLL
equals the sketch built directly on the union (lossless mergeability).
"""

from __future__ import annotations

import math

from spark_sklearn_spark.queries.sketches import (
    HLL_M,
    q_sketch_bloom,
    q_sketch_countmin,
    q_sketch_hll,
    q_sketch_hll_merge,
)


def test_countmin_never_underestimates(spark, sf_dir):
    rows = q_sketch_countmin(spark, sf_dir).collect()
    assert rows, "count-min returned no heavy hitters"
    for r in rows:
        assert r.est_cnt >= r.true_cnt, (
            f"CMS underestimated part {r.l_partkey}: "
            f"{r.est_cnt} < {r.true_cnt}"
        )
        assert r.overcount == r.est_cnt - r.true_cnt


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = q_sketch_bloom(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every member must probe positive: maybe-count >= member-count
        assert r.n_maybe >= r.n_member, (
            f"nation {r.c_nationkey}: false negative "
            f"({r.n_maybe} maybe < {r.n_member} members)"
        )
        assert r.n_false_pos == r.n_maybe - r.n_member


def test_hll_within_error_band(spark, sf_dir):
    rows = q_sketch_hll(spark, sf_dir).collect()
    assert rows
    # standard error for p=8 is 1.04/sqrt(256) = 6.5%; allow 5 sigma
    band = 5 * 1.04 / math.sqrt(HLL_M)
    for r in rows:
        assert abs(r.rel_err) <= band, (
            f"{r.event_type}: HLL rel err {r.rel_err} outside ±{band:.3f}"
        )


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    """Merging per-source registers must give EXACTLY the estimate of
    a sketch built over all docs at once — max() is associative, so
    the two register sets are identical."""
    merged = q_sketch_hll_merge(spark, sf_dir).collect()[0]
    band = 5 * 1.04 / math.sqrt(HLL_M)
    assert abs(merged.rel_err) <= band

    from pyspark.sql import functions as F

    from spark_sklearn_spark.queries.sketches import _W48, _h56
    from spark_sklearn_spark.sources.io import load

    docs = load(spark, sf_dir, "documents").select(
        _h56("hll", "cast(doc_id as string)").alias("h")
    )
    regs = (
        docs.select(
            F.shiftright("h", 48).alias("bucket"),
            F.col("h").bitwiseAND(F.lit(_W48)).alias("w"),
        )
        .groupBy("bucket")
        .agg(
            F.max(
                F.when(F.col("w") == 0, 49).otherwise(
                    F.lit(49) - F.length(F.bin("w"))
                )
            ).alias("m")
        )
    )
    direct = {r.bucket: r.m for r in regs.collect()}
    # rebuild the merged register set the query's first two stages
    # produce, and compare register-for-register
    srcs = load(spark, sf_dir, "documents").select(
        "source", _h56("hll", "cast(doc_id as string)").alias("h")
    )
    merged_regs = (
        srcs.select(
            "source",
            F.shiftright("h", 48).alias("bucket"),
            F.col("h").bitwiseAND(F.lit(_W48)).alias("w"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.max(
                F.when(F.col("w") == 0, 49).otherwise(
                    F.lit(49) - F.length(F.bin("w"))
                )
            ).alias("m")
        )
        .groupBy("bucket")
        .agg(F.max("m").alias("m"))
    )
    via_merge = {r.bucket: r.m for r in merged_regs.collect()}
    assert via_merge == direct
