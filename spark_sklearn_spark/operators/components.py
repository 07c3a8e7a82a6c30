"""Connected components via min-label propagation with pointer
jumping — the transitive-closure step a dedup pipeline needs to turn
near-dup PAIRS into dup CLUSTERS (keep one doc per component, not per
pair).

Spark has no native iterate-to-fixpoint operator, so this is a driver
loop of DataFrame joins. Each round does TWO label-shrinking steps:

1. one-hop neighbor min: every node adopts the smallest label among
   itself and its direct neighbors (the classic propagation step);
2. pointer jump: every node then replaces its label with its LABEL'S
   label (labels are node ids, so the label row always exists).

Step 2 is the pointer-jumping trick from PRAM connectivity: label
chains halve in depth per jump, so a path that one-hop propagation
alone walks in O(diameter) rounds converges in O(log diameter) —
a planted 100-node chain needs 6 rounds instead of 99 (r5 VERDICT
scale fix: templated near-dup chains at 100 TB exceeded the round
budget and the operator could only raise). Near-dup graphs are almost
all tiny cliques, so 2-3 rounds remains typical; the log bound is the
worst-case insurance.

Scale hygiene per round:
- labels persist + previous round unpersists (bounded cache),
- lineage is cut with localCheckpoint every few rounds so the plan
  doesn't grow by three joins per iteration (the classic iterative-
  Spark plan-explosion trap),
- convergence check is a count of changed labels — one small action
  per round, never a collect of the labels themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Rounds the most recent connected_components() call took to converge
# (including the final no-change round). Read by tests asserting the
# O(log diameter) bound; not part of the public API.
LAST_ITERATIONS: int = 0


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
    global LAST_ITERATIONS
    # Symmetrize with ONE Generate, not a self-union: a union's two
    # branches each re-evaluate the caller's (possibly expensive, e.g.
    # LSH-pipeline) edge DataFrame inside the persist-fill job —
    # measured 2× the whole SRP pair build for the semantic-cluster
    # caller. explode keeps it a single pass.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
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
        # (1) one-hop: for node a, min over own label and neighbor labels
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("lbl"))
        )
        hop = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .persist()  # read twice by the jump self-join below
        )
        # (2) pointer jump: lbl <- lbl(lbl). Labels are node ids (mins
        # over node-id sets), so hop always has a row for the label
        # itself; its label is <= ours because a node's own min
        # includes itself — the jump only ever shrinks.
        parent = hop.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        new_labels = (
            hop.join(parent, hop.lbl == parent.p_node)
            .select("node", F.col("p_lbl").alias("lbl"))
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
        hop.unpersist()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            LAST_ITERATIONS = it + 1
            break
    else:
        sym.unpersist()
        labels.unpersist()
        LAST_ITERATIONS = max_iterations
        # even with pointer jumping a round budget this size should
        # never bind (2^20 ≫ any diameter); a silent non-converged
        # return would mislabel nodes, so raise loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — pathological input (or raise max_iterations)"
        )
    sym.unpersist()
    # NOTE: the final labels relation stays persisted — the returned
    # DataFrame is lazy and depends on it. Long-lived sessions running
    # many invocations should clearCache() between jobs (bench.py does).
    return (
        labels.join(node_set, "node")
        .select(F.col("node").alias(node_col), F.col("lbl").alias("cluster_id"))
    )
