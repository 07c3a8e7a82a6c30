"""Distributed PageRank — importance scoring over the near-dup (or
any) edge set, the canonical beyond-components graph analytic.

Same driver-loop posture as operators/components.py: Spark has no
native iterate-to-fixpoint, so each iteration is one join + one hash
aggregate, with persist/unpersist hygiene and periodic localCheckpoint
to stop plan growth. A FIXED iteration count (default 5) keeps the
loop bounded and the cost predictable — PageRank converges
geometrically at rate d, so 5 rounds already separate hubs from
leaves, and downstream consumers (dedup triage, crawl prioritization)
need ordering, not 1e-12 convergence.

The 100 TB trick: near-dup graphs are mostly ISOLATED nodes (singleton
docs), and an isolated node's rank is the same scalar for all of them
— it evolves by the driver-side recurrence r_iso ← (1-d)/n +
d·D/n with D the total dangling mass. So the Spark loop runs ONLY
over the active subgraph (nodes with an in- or out-edge), isolated
nodes join back at the end as one literal, and — when no active node
is dangling (always true for symmetrized undirected edges) — the
dangling mass needs NO per-round cluster aggregate either. Per
iteration that leaves exactly one shuffle (edges ⋈ ranks →
combinable re-agg) over |active| rows, not |nodes|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 3,
    exact_contribs: bool = False,
) -> DataFrame:
    """(node_col, rank, out_degree) after ``iterations`` rounds.

    nodes: one row per node (isolated nodes allowed — they become
    dangling and their mass redistributes); edges: DIRECTED pairs
    (symmetrize upstream for an undirected graph).

    exact_contribs=True quantizes each per-edge contribution to
    DECIMAL(30,10) and sums decimals exactly, making every rank a
    deterministic double REGARDLESS of aggregation order — the same
    mirroring trick as queries/_helpers.dsum, applied per iteration
    so a SQL oracle can replay the propagation bit-for-bit. Scale 10
    is deliberate: Spark quantizes via Double.toString (<= 1e-19 off
    the binary value), so a finer grid (say 1e-18) puts ~10% of
    quantizations on a boundary the two engines could resolve
    differently, while at 1e-10 the straddle odds are ~1e-9 and the
    quantization error stays far below PageRank's own 5-iteration
    truncation error.
    """
    caller_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    # Propagate over nodes ∪ edge endpoints (the components.py rule):
    # an endpoint absent from ``nodes`` would otherwise receive
    # addressed rank mass that the left join silently DROPS, deflating
    # every rank and breaking Σrank = 1. The output is filtered back
    # to the caller's node set at the end.
    #
    # One MARKED relation carries node-set membership + out-degree, so
    # the three driver scalars (n, n_active, active-dangling count)
    # come from ONE eager agg job over it instead of three separate
    # count jobs, and the isolated set at the end is a filter rather
    # than an anti-join (r10: measured ~1.1 s -> ~0.4 s on the eager
    # prologue at sf0.1). r17: the relation is built as one stacked
    # union → single hash agg on node (max membership flag, summed
    # src-occurrence count) instead of distinct endpoints + node-set
    # distinct + two left joins — same (node, is_ep, out_deg) rows,
    # four fewer exchanges in the prologue job.
    marked = (
        caller_nodes.select(
            "node", F.lit(0).alias("ep"), F.lit(0).alias("dg")
        )
        .unionByName(
            e.select(
                F.col("src").alias("node"),
                F.lit(1).alias("ep"),
                F.lit(1).alias("dg"),
            )
        )
        .unionByName(
            e.select(
                F.col("dst").alias("node"),
                F.lit(1).alias("ep"),
                F.lit(0).alias("dg"),
            )
        )
        .groupBy("node")
        .agg(
            F.max("ep").alias("is_ep"),
            F.sum("dg").alias("out_deg"),
        )
        .persist()
    )
    n, n_active, n_active_dangling = marked.agg(
        F.count(F.lit(1)),
        F.count_if(F.col("is_ep") == 1),
        F.count_if((F.col("is_ep") == 1) & (F.col("out_deg") == 0)),
    ).first()
    n_iso = n - n_active
    # Active nodes with no out-edges (receive-only sinks) would need a
    # per-round dangling aggregate; a symmetrized graph has none.
    active = marked.filter(F.col("is_ep") == 1).select(
        "node", "out_deg"
    )

    teleport = (1.0 - damping) / n
    r_iso = 1.0 / n  # shared rank of every isolated node (driver scalar)
    ranks = active.select("node", "out_deg", F.lit(1.0 / n).alias("rank")).persist()

    # With no active dangling node (the symmetrized-undirected case)
    # every per-round scalar is known up front, so the rounds CHAIN
    # LAZILY — Catalyst sees one 5-join plan and the whole propagation
    # is a single job instead of iterations× (materialize + schedule),
    # which on tiny active subgraphs is almost pure overhead (~1.8 s
    # per materialized round measured at sf0.1 for 250 active nodes).
    # An active dangling node forces the per-round aggregate + persist.
    lazy = n_active_dangling == 0
    materialized = ranks
    for it in range(iterations):
        dangling = n_iso * r_iso
        if not lazy:
            # keep the exact_contribs determinism promise on the
            # dangling path too: an unquantized double sum here is
            # aggregation-order-dependent
            dang_rank = F.col("rank")
            if exact_contribs:
                dang_rank = dang_rank.cast("decimal(30,10)")
            dangling += float(
                ranks.filter(F.col("out_deg") == 0)
                .agg(
                    F.coalesce(
                        F.sum(dang_rank).cast("double"), F.lit(0.0)
                    )
                )
                .first()[0]
            )
        c_expr = F.col("rank") / F.col("out_deg")
        if exact_contribs:
            c_expr = c_expr.cast("decimal(30,10)")
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", c_expr.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("contrib"))
        )
        new_ranks = (
            active.join(contribs, active.node == contribs.dst, "left")
            .select(
                "node",
                "out_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        if lazy:
            ranks = new_ranks  # no action: rounds fuse into one plan
        else:
            if (it + 1) % checkpoint_every == 0:
                new_ranks = new_ranks.localCheckpoint(eager=False)
            new_ranks = new_ranks.persist()
            new_ranks.count()  # materialize before dropping the parent
            materialized.unpersist()
            ranks = materialized = new_ranks
        r_iso = teleport + damping * (dangling / n)

    e.unpersist()
    # marked stays persisted: the returned lazy DataFrame reads it
    # twice (same note as operators/components.py).
    isolated = marked.filter(F.col("is_ep") == 0).select(
        "node",
        F.lit(float(r_iso)).alias("rank"),
        F.lit(0).alias("out_deg"),
    )
    return (
        ranks.select("node", "rank", "out_deg")
        .unionByName(isolated)
        .join(caller_nodes, "node")  # drop phantom endpoints from output
        .select(
            F.col("node").alias(node_col),
            "rank",
            F.col("out_deg").alias("out_degree"),
        )
    )
