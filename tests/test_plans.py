"""Plan-property tests: assert the PHYSICAL shape that makes each
operator scale, not just its output (VERDICT r1 item 7).

A query can be value-correct with a plan that dies at 100× data —
these tests pin the plan: pushdown reaches the parquet scan, column
pruning reaches ReadSchema, small dims broadcast, the theta join
never degenerates to a nested loop, and the ntile ranking never
funnels through a single partition.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry
from pyspark.sql import functions as F


def _plan(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_reaches_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_scan_pushdown")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan


def test_partitioned_source_prunes_at_plan_time(spark, sf_dir):
    """q_source_partitioned_prune must carry its event_type predicate
    as a PartitionFilters entry on the scan (directory pruning), not
    a post-scan Filter over all partitions."""
    plan = _plan(spark, sf_dir, "q_source_partitioned_prune")
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in pf, pf


def test_scan_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_scan_projection")
    # ReadSchema must carry only the two projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_theta_join_is_not_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_theta")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__band" in plan  # the banded equi-join key is in play


def test_ntile_has_no_single_partition_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_win_ntile")
    # the ranking window must partition by the histogram bucket, and
    # nothing in the plan may funnel everything to one partition
    assert "hashpartitioning(__bucket" in plan
    assert "SinglePartition" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_topk_limit")
    assert "TakeOrderedAndProject" in plan


def test_multimodal_join_is_bucketed_zero_exchange(spark, sf_dir):
    """documents⋈embeddings is 1:1 table-to-table — broadcasting either
    side grows with the corpus. The co-bucketed sort-merge join must
    run with ZERO Exchange (bucket-local scans on both sides) and no
    broadcast of the embeddings relation."""
    plan = _plan(spark, sf_dir, "q_multimodal_cols")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Bucketed: true") == 2


def test_dedup_clusters_never_broadcasts_cluster_sizes(spark, sf_dir):
    """component_size must come from a cluster-partitioned window, not
    a join against an O(#clusters) relation — #clusters is within a
    constant factor of #documents on a mostly-unique corpus, so a
    static broadcast of it melts the driver at scale. (AQE may still
    broadcast genuinely-small sides inside the LSH subplans — that's
    runtime-sized and reverts to shuffle at scale; the pinned property
    is that no join is keyed on cluster_id.)"""
    import re

    plan = _plan(spark, sf_dir, "q_dedup_clusters")
    assert re.search(r"Window \[count\(1\) windowspecdefinition\(cluster_id", plan)
    assert not re.search(r"Join \[cluster_id", plan)


def test_agg_hash_is_partial_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_agg_hash")
    # partial (map-side) aggregation must appear before the exchange
    assert plan.count("HashAggregate") >= 2


def test_no_unexpected_cartesian_anywhere(spark, sf_dir):
    # every declared relational query except the intentional cross join
    # and the single-row broadcast crossJoins must avoid cartesians
    allowed = {"q_join_cross", "q_sim_knn_brute", "q_text_tfidf"}
    for name in [
        "q_join_shuffle",
        "q_join_multiway",
        "q_join_outer",
        "q_join_range_ts",
        "q_join_asof",
        "q_dedup_minhash",
        "q_sim_pairs_threshold",
    ]:
        assert name not in allowed
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_plans_inspect_utilities(spark, sf_dir):
    """Dogfood spark_sklearn_spark.plans: pushdown/pruning extraction
    and the scale-killer assertion."""
    from spark_sklearn_spark.plans import (
        assert_scalable,
        pushed_filters,
        read_schema,
    )
    import pytest as _pytest

    qs = entry.queries()
    scan = qs["q_scan_pushdown"](spark, sf_dir)
    assert pushed_filters(scan), "expected filters pushed to parquet"
    proj = qs["q_scan_projection"](spark, sf_dir)
    assert set(read_schema(proj)) == {"l_orderkey", "l_quantity"}
    assert_scalable(qs["q_join_theta"](spark, sf_dir))
    with _pytest.raises(AssertionError, match="scale-killers"):
        assert_scalable(qs["q_join_cross"](spark, sf_dir))


def test_parse_filter_list_robustness():
    """The filter tokenizer must survive Spark's node-string quirks:
    commas inside filters, ellipsis truncation mid-list, ellipsis
    inside a complete filter, and the normal closing bracket."""
    from spark_sklearn_spark.plans.inspect import _parse_filter_list

    # commas inside a filter stay in one token
    assert _parse_filter_list(
        "GreaterThan(l_shipdate,1997-01-01 00:00:00.0)], ReadSchema: x"
    ) == ["GreaterThan(l_shipdate,1997-01-01 00:00:00.0)"]
    # truncated trailing token is discarded, not returned as garbage
    assert _parse_filter_list(
        "IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipda..."
    ) == ["IsNotNull(l_shipdate)"]
    # an abbreviated-but-complete filter containing dots is kept whole
    assert _parse_filter_list(
        "StringContains(p_name,...), IsNotNull(p_name)]"
    ) == ["StringContains(p_name,...)", "IsNotNull(p_name)"]
    # plain short list
    assert _parse_filter_list("IsNotNull(a), EqualTo(b,1)]") == [
        "IsNotNull(a)",
        "EqualTo(b,1)",
    ]


def test_window_partitions_parser():
    """window_partitions_from_text must distinguish the three Window
    node prints: [funcs], [partition], [order] (partitioned);
    [funcs], [order] (global running — order tokens present); and
    [funcs], [partition] (partition-only, no ORDER BY — the shape the
    r13 parser fix addressed: it was misread as global)."""
    from spark_sklearn_spark.plans.inspect import (
        window_partitions_from_text,
    )

    plan = "\n".join(
        [
            "+- Window [row_number() windowspecdefinition(user_id#2L,"
            " ts#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame,"
            " unboundedpreceding$(), currentrow$())) AS rn#9],"
            " [user_id#2L], [ts#3 ASC NULLS FIRST]",
            "   +- Window [sum(f#17L) windowspecdefinition(v#16L ASC"
            " NULLS FIRST, specifiedwindowframe(RowFrame,"
            " unboundedpreceding$(), -1)) AS _we0#23L],"
            " [v#16L ASC NULLS FIRST]",
            "      +- Window [count(1) windowspecdefinition("
            "cluster_id#5L, specifiedwindowframe(RowFrame,"
            " unboundedpreceding$(), unboundedfollowing$()))"
            " AS csize#7L], [cluster_id#5L]",
        ]
    )
    assert window_partitions_from_text(plan) == [
        ["user_id"],
        [],
        ["cluster_id"],
    ]


def test_srp_dedup_has_no_all_pairs_stage(spark, sf_dir):
    """The SRP-LSH dedup query (the production embedding-dedup path)
    must contain no cartesian/BNLJ and no single-partition exchange —
    the property that distinguishes it from the exact block-matmul."""
    from spark_sklearn_spark.plans import assert_scalable

    assert_scalable(entry.queries()["q_dedup_embedding_lsh"](spark, sf_dir))


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned parquet (the lake layout for time-series
    facts): a filter on the partition column must become a
    PartitionFilter — pruned at file-listing time, before any IO —
    not a post-scan predicate."""
    from spark_sklearn_spark.sources.io import load, write_parquet

    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_parquet(o, path, partition_by=["o_year"])
    back = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "1997" in m.group(1), plan[:2000]
    assert back.count() > 0


def test_ngram_dedup_is_postings_join_not_cartesian(spark, sf_dir):
    """q_dedup_ngram's exact Jaccard must come from the postings
    equi-join on the gram, never a doc x doc cartesian; same for the
    rolling-hash fingerprint (Generate + one hash agg)."""
    from spark_sklearn_spark.plans import assert_scalable

    assert_scalable(entry.queries()["q_dedup_ngram"](spark, sf_dir))
    assert_scalable(entry.queries()["q_text_fingerprint_rolling"](spark, sf_dir))


def test_sample_hash_filter_reaches_scan_side(spark, sf_dir):
    """The deterministic sample predicate is codegen'd ahead of the
    aggregate — no join, no Python, no extra exchange beyond the
    group-by."""
    plan = _plan(spark, sf_dir, "q_sample_hash")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_q2_min_window_is_key_partitioned(spark, sf_dir):
    """Q2's correlated-min rewrite must keep the window partitioned by
    part key (no single-partition window) and stay cartesian-free."""
    plan = _plan(spark, sf_dir, "q_tpch_q2")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_skew_join_salts_a_shuffled_hash_join(spark, sf_dir):
    """q_join_skew must go through the salt stage (not a broadcast,
    which would make the salting decorative): the executed plan shows
    a ShuffledHashJoin keyed on (k, __salt)."""
    plan = _plan(spark, sf_dir, "q_join_skew")
    assert "ShuffledHashJoin" in plan
    assert "__salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_r4_additions_are_scalable(spark, sf_dir):
    """Round-4 queries: no cartesians, no broadcast nested loops, no
    single-partition exchanges anywhere in the executed plans. The
    fuzzy join in particular must stay an equi-join on the blocking
    key (an unblocked similarity join would be a BNLJ)."""
    from spark_sklearn_spark.plans import assert_scalable

    qs = entry.queries()
    for name in [
        "q_win_distribution",
        "q_fuzzy_join",
        "q_text_winnow",
        "q_dedup_canonical",
        "q_text_chunk",
        "q_emb_quantize",
        "q_text_ngram_counts",
        "q_sample_stratified",
        "q_agg_histogram",
        "q_retention_cohort",
        "q_ts_gapfill",
    ]:
        assert_scalable(qs[name](spark, sf_dir))


def test_funnel_joins_carry_no_forced_broadcast(spark, sf_dir):
    """Funnel stage relations are user-cardinality, so the query must
    not FORCE a broadcast (no hint in the logical plan) — AQE is free
    to pick one at runtime when the stage output is actually small,
    which is the scale-safe behavior. Cartesian-free as always. (The
    funnel ends in three single-row counts, so assert_scalable's
    SinglePartition check doesn't apply.)"""
    import __spark_entry__ as e

    df = e.queries()["q_funnel_ordered"](spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "broadcast" not in logical.lower()
    plan = _plan(spark, sf_dir, "q_funnel_ordered")
    assert "CartesianProduct" not in plan


def test_fuzzy_join_is_hash_join_on_block_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_fuzzy_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_and_quantize_stay_jvm_side(spark, sf_dir):
    """Chunking and quantization are pure projections: no shuffle
    beyond the final presentation sort, no Python evaluation."""
    for name in ("q_text_chunk", "q_emb_quantize"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Join" not in plan, name


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning: a selective filter on the
    dimension side injects might_contain(bloom_filter_agg(dim_keys))
    into the fact-side scan, dropping non-joining fact rows BEFORE
    the shuffle — the selective-join strategy at 100 TB when the dim
    is too big to broadcast but selective enough to sketch.
    Thresholds are lowered so the rewrite is observable at fixture
    scale; session confs are restored afterwards."""
    from spark_sklearn_spark.sources.io import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_and_repetition_are_two_level_hash_aggs(spark, sf_dir):
    """q_quality_gate / q_text_repetition: explode → (doc, token|gram)
    agg → per-doc rollup. No joins, no windows, no Python crossings —
    the whole corpus pass must be combinable hash aggregation."""
    from spark_sklearn_spark.plans import assert_scalable

    for name in ("q_quality_gate", "q_text_repetition"):
        df = entry.queries()[name](spark, sf_dir)
        assert_scalable(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_benchmark_ngrams(spark, sf_dir):
    """The benchmark n-gram set is the genuinely-small relation —
    it must broadcast; the corpus n-gram stream must never shuffle
    for the join itself."""
    plan = _plan(spark, sf_dir, "q_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pii_redact_is_pure_projection(spark, sf_dir):
    """Compliance scrubbing must stream at scan speed: no join, no
    aggregation, no Python — regex count/replace inside codegen."""
    plan = _plan(spark, sf_dir, "q_pii_redact")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ts_anomaly_window_is_user_partitioned(spark, sf_dir):
    """The trailing z-score frame must partition by user_id — a global
    ordered window would serialize the event stream."""
    plan = _plan(spark, sf_dir, "q_ts_anomaly")
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_knn_batch_partitions_topk_by_query(spark, sf_dir):
    """Batched kNN: per-query top-k must be a window partitioned by
    query_id (parallel), never a single-partition sort of all scores.
    (The probe set ships inside the Arrow-task closure — see
    test_knn_batch_python_rows_are_bounded for the mapInPandas shape.)"""
    plan = _plan(spark, sf_dir, "q_sim_knn_batch")
    assert "hashpartitioning(query_id" in plan
    assert "SinglePartition" not in plan


def test_pack_sequences_window_is_shard_partitioned(spark, sf_dir):
    """Packing must run one cumsum per (source, shard) stream — the
    shard key is what keeps the concatenation order deterministic AND
    parallel; a global cumsum would be a single-partition window."""
    plan = _plan(spark, sf_dir, "q_pack_sequences")
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_sample_temperature_broadcasts_rate_table(spark, sf_dir):
    """The per-source rate relation (#sources rows) broadcasts; the
    corpus side is one scan + one combinable rollup."""
    from spark_sklearn_spark.plans import assert_scalable

    df = entry.queries()["q_sample_temperature"](spark, sf_dir)
    # the single-row weight-total crossJoin is a broadcast of 1 row —
    # same allowed pattern as the tfidf doc-count broadcast
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_emb_outliers_centroids_broadcast_and_label_topk(spark, sf_dir):
    """Centroids are (label, dim) cells — bounded, broadcastable; the
    distance agg must stay combinable and the top-k window label-
    partitioned."""
    plan = _plan(spark, sf_dir, "q_emb_outliers")
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(label" in plan
    assert "SinglePartition" not in plan


def test_no_interpreted_lambda_in_filters(spark, sf_dir):
    """Generate (explode) pruning pushes `size(arr) > 0 AND
    isnotnull(arr)` into the scan Filter; when arr is an interpreted
    higher-order transform the filter re-evaluates it per row — with
    any upstream projection (e.g. split()) re-inlined per element.
    Measured 5-9× walls on the ngram queries. Pin: no Filter node may
    contain a lambda expression — the explode_outer + null-drop idiom
    keeps the transform in a Project."""
    for name in (
        "q_decontaminate",
        "q_text_repetition",
        "q_dedup_ngram",
        "q_text_ngram_counts",
        "q_emb_dimstats",
        "q_emb_outliers",
    ):
        df = entry.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            stripped = line.lstrip(" +-:*")
            if stripped.startswith("Filter") or stripped.startswith("PushedFilters"):
                assert "lambdafunction" not in line, (name, line[:300])


def test_bm25_and_pmi_end_in_take_ordered(spark, sf_dir):
    """Both retrieval-scoring queries finish with TakeOrderedAndProject
    (top-k, never a global sort) and contain no cartesian product (the
    1-row stats/total crossJoins are broadcasts)."""
    for name in ("q_text_bm25", "q_text_pmi"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_knn_batch_python_rows_are_bounded(spark, sf_dir):
    """The batched kNN must prune to local top-k INSIDE the Arrow task:
    the plan is mapInPandas → window top-k, with no per-row JVM fold
    join (the broadcast-NLJ shape it replaced)."""
    plan = _plan(spark, sf_dir, "q_sim_knn_batch")
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(query_id" in plan


def test_incremental_merge_is_all_hash_aggs(spark, sf_dir):
    """Snapshot ⊕ delta merge: two partial aggs + union + re-agg —
    no join, no window, every agg partial+final."""
    plan = _plan(spark, sf_dir, "q_agg_incremental")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final × (branch, merge)


def test_zorder_key_is_codegen_no_prekey_shuffle(spark, sf_dir):
    """The Morton key build must be pure projection (no Python, no
    join); the only exchanges are the bounded stats agg + final sort."""
    plan = _plan(spark, sf_dir, "q_layout_zorder")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_profile_table_avoids_expand_multi_distinct(spark, sf_dir):
    """The profiler's exact ndv must come from the (column, value)
    pre-aggregation, not Spark's expand-based multi-distinct (row
    multiplication + single-partition final agg)."""
    plan = _plan(spark, sf_dir, "q_profile_table")
    assert "Expand" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final × two levels


def test_split_train_is_single_scan_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_split_train")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline12_batch_is_scalable(spark, sf_dir):
    """Round-8 pipeline12 queries: the event-relation stages (pathing
    window, ALS solves, BPE recount) must stay free of cartesians and
    single-partition exchanges. Benford / holt / theilsen / the kNN
    panel join legitimately carry a bounded-side broadcast nested
    loop (1-row totals or a fixed probe panel — the q_emb_hamming_knn
    posture), so they assert with allow_cartesian."""
    from spark_sklearn_spark.plans import assert_scalable

    from spark_sklearn_spark.plans.inspect import executed_plan

    qs = entry.queries()
    for name in ["q_behavior_pathing", "q_ml_als_round"]:
        assert_scalable(qs[name](spark, sf_dir))
    # the rest stage their statistics on bounded relations (9-digit /
    # calendar-grain / probe-panel / 1-row argmax), where a global agg's
    # SinglePartition exchange and a bounded-side BNLJ are by design;
    # the property that must hold is: no true cartesian anywhere
    for name in [
        "q_dq_benford",
        "q_ts_rolling_median",
        "q_ts_holt",
        "q_ts_theilsen",
        "q_ml_knn_classify",
        "q_text_bpe_merge",
    ]:
        plan = executed_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_pipeline13_batch_is_scalable(spark, sf_dir):
    """Round-8 pipeline13 queries: corpus-relation stages must stay
    free of cartesians; the panel-scored NDCG and the bounded stats
    queries check the weaker no-true-cartesian property (the
    pipeline12 posture)."""
    from spark_sklearn_spark.plans import assert_scalable
    from spark_sklearn_spark.plans.inspect import executed_plan

    qs = entry.queries()
    for name in [
        "q_fn_datetime_format",
        "q_emb_norm_audit",
        "q_sketch_kmv",
    ]:
        assert_scalable(qs[name](spark, sf_dir))
    for name in [
        "q_behavior_stickiness",
        "q_text_jsd_pairwise",
        "q_graph_bfs",
        "q_ml_ndcg",
    ]:
        plan = executed_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
