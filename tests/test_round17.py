"""Round-17 gates (optimization round): the r17 driver-window rotation
pin — head = canary + the 15 keys whose Spark-side implementation was
restructured this round (results value-identical, oracles untouched;
the driver must re-hash them under the new plans), tail =
(latest-sample round, name) staleness order, putting the 3-key r7
residual + the name-first r8 band keys inside the 50-key window — and
value-identity spot checks for the restructured operators (the
multi-column ntile must assign exactly the tiles the sequential form
assigns; the distinct-gram MinHash signature must equal the exploded
form's minima).
"""

from __future__ import annotations

# The 15 r17-restructured keys, in their pinned head order (slot 0 is
# the canary). See registry.py's rotation comment for what changed in
# each.
R17_CHANGED = [
    "q_graph_pagerank",
    "q_dedup_recall_minhash",
    "q_dedup_editdist",
    "q_dedup_incremental",
    "q_text_minhash_containment",
    "q_graph_copurchase",
    "q_sketch_countmin",
    "q_text_bpe_merge",
    "q_text_bpe_pairs",
    "q_text_novelty",
    "q_dedup_segments",
    "q_behavior_rfm",
    "q_win_ntile",
    "q_ml_grid_search",
    "q_ml_random_search",
]

# the 3 keys the r16 50-cap displaced (VERDICT r16 item 1) — they and
# the oldest r8-band keys fill the window behind the head
R7_RESIDUAL = ["q_ts_ewma", "q_ts_ohlc", "q_win_pareto"]


def test_window_head_is_canary_plus_changed_keys():
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    assert DRIVER_PRIORITY[:16] == ["q_dq_engine_canary", *R17_CHANGED]


def test_window_covers_r7_residual_then_r8_band():
    """Slots 16–18: the r7 residual (the oldest driver evidence on
    the surface). The rest of the 50-key window is the name-first
    slice of the r8 staleness band."""
    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    assert DRIVER_PRIORITY[16:19] == R7_RESIDUAL
    window_tail = DRIVER_PRIORITY[19:50]
    assert window_tail == sorted(window_tail)  # one round => name order


def test_priority_tail_is_staleness_ordered():
    """Behind the 16-key head the list is (latest-sample round, name)
    sorted — recomputed from CORRECTNESS_r1..r16 at rotation time.
    Spot-check: the r7 residual precedes every r8-band key, and the
    r8 band is contiguous and name-sorted."""
    import glob
    import json
    import re

    from spark_sklearn_spark.registry import DRIVER_PRIORITY

    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        if rnd >= 17:
            continue  # rotation derives from pre-r17 evidence only
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    tail = DRIVER_PRIORITY[16:]
    keys_rounds = [(latest.get(k, 0), k) for k in tail]
    assert keys_rounds == sorted(keys_rounds)


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
