"""Connected components via iterative min-label propagation — the
transitive-closure step a dedup pipeline needs to turn near-dup PAIRS
into dup CLUSTERS (keep one doc per component, not per pair).

Spark has no native iterate-to-fixpoint operator, so this is a driver
loop of DataFrame joins: each round every node adopts the smallest
label among itself and its neighbors; convergence in O(component
diameter) rounds. Near-dup graphs are almost all tiny cliques, so
2-3 rounds is typical.

Scale hygiene per round:
- labels persist + previous round unpersists (bounded cache),
- lineage is cut with localCheckpoint every few rounds so the plan
  doesn't grow by two joins per iteration (the classic iterative-
  Spark plan-explosion trap),
- convergence check is a count of changed labels — one small action
  per round, never a collect of the labels themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    max_iterations: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    nodes: one row per node (singletons allowed); edges: undirected
    pairs (either orientation). Output: (node_col, cluster_id).
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .persist()
    )
    node_set = nodes.select(F.col(node_col).alias("node"))
    # Seed labels from nodes ∪ edge endpoints: an endpoint absent from
    # ``nodes`` would otherwise never appear in the changed-count join,
    # so convergence would be declared before labels propagate THROUGH
    # it — silently under-merging components that connect via the
    # phantom node. Propagation runs over the union; the final output
    # is filtered back to the caller's node set (the documented
    # contract).
    all_nodes = node_set.unionByName(sym.select(F.col("a").alias("node"))).distinct()
    labels = all_nodes.select("node", F.col("node").alias("lbl")).persist()

    for it in range(max_iterations):
        # neighbor labels: for node a, the labels of everything it touches
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("lbl"))
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        sym.unpersist()
        labels.unpersist()
        # one-hop propagation needs O(component diameter) rounds; a
        # silent non-converged return would mislabel long chains
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — raise max_iterations (diameter-long chains) or "
            "switch to pointer-jumping for pathological graphs"
        )
    sym.unpersist()
    # NOTE: the final labels relation stays persisted — the returned
    # DataFrame is lazy and depends on it. Long-lived sessions running
    # many invocations should clearCache() between jobs (bench.py does).
    return (
        labels.join(node_set, "node")
        .select(F.col("node").alias(node_col), F.col("lbl").alias("cluster_id"))
    )
