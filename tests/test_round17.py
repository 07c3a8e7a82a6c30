"""Round-17 value-identity gates for the restructured operators (the
multi-column ntile must assign exactly the tiles the sequential form
assigns; the distinct-gram MinHash signature must equal the exploded
form's minima). The r17 driver-window rotation pins are retired —
tests/test_round18.py pins the live window.
"""

from __future__ import annotations


def test_multi_ntile_matches_sequential(spark):
    """multi_distributed_ntile must assign exactly the tiles three
    sequential distributed_ntile calls assign (the q_behavior_rfm
    rewrite's identity argument)."""
    from pyspark.sql import functions as F

    from spark_sklearn_spark.operators.ranking import (
        distributed_ntile,
        multi_distributed_ntile,
    )

    df = spark.range(0, 97).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 11).alias("a"),
        (F.col("id") * 13 % 7).alias("b"),
    )
    seq = distributed_ntile(df, "a", ["k"], 4, out_col="ta")
    seq = distributed_ntile(seq, "b", ["k"], 4, out_col="tb")
    multi = multi_distributed_ntile(df, [("a", "ta"), ("b", "tb")], ["k"], 4)
    left = {tuple(r) for r in seq.select("k", "ta", "tb").collect()}
    right = {tuple(r) for r in multi.select("k", "ta", "tb").collect()}
    assert left == right


def test_distinct_gram_minhash_matches_exploded(spark):
    """The per-distinct-gram hash-array signature (r17) must produce
    the same (doc, band, h0, h1) rows as the 16x-exploded per-posting
    form it replaced."""
    from pyspark.sql import functions as F

    from spark_sklearn_spark.queries._helpers import h56
    from spark_sklearn_spark.queries.pipeline8 import MH_K, MH_R

    capped = spark.createDataFrame(
        [(1, "a b c"), (1, "b c d"), (2, "a b c"), (2, "x y z"),
         (3, "x y z")],
        "doc_id long, g string",
    )
    old = (
        capped.select(
            "doc_id",
            F.explode(F.array(*[F.lit(i) for i in range(MH_K)])).alias("i"),
            "g",
        )
        .select(
            "doc_id", "i",
            h56("concat(cast(i as string), ':', g)").alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
        .groupBy(
            "doc_id", F.floor(F.col("i") / MH_R).cast("long").alias("band")
        )
        .agg(
            F.min(F.when(F.col("i") % MH_R == 0, F.col("mh"))).alias("h0"),
            F.min(F.when(F.col("i") % MH_R == 1, F.col("mh"))).alias("h1"),
        )
    )
    gh = capped.select("g").distinct().select(
        "g",
        F.array(
            *[h56(f"concat('{i}:', g)") for i in range(MH_K)]
        ).alias("hs"),
    )
    sig = (
        capped.join(gh, "g")
        .groupBy("doc_id")
        .agg(
            *[F.min(F.col("hs")[i]).alias(f"mh{i}") for i in range(MH_K)]
        )
    )
    stack_args = ", ".join(
        f"{b}L, mh{MH_R * b}, mh{MH_R * b + 1}"
        for b in range(MH_K // MH_R)
    )
    new = sig.select(
        "doc_id",
        F.expr(f"stack({MH_K // MH_R}, {stack_args}) AS (band, h0, h1)"),
    )
    assert {tuple(r) for r in old.collect()} == {
        tuple(r) for r in new.collect()
    }
