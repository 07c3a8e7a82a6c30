"""Connected-components operator tests: transitivity, singletons,
convergence guard, and a randomized comparison against a local
union-find oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_sklearn_spark.operators.components import connected_components


def _cc(spark, n_nodes, edge_list, **kw):
    nodes = spark.createDataFrame(pd.DataFrame({"n": list(range(n_nodes))}))
    pdf = (
        pd.DataFrame(edge_list, columns=["s", "t"])
        if edge_list
        else pd.DataFrame({"s": [], "t": []})
    )
    edges = spark.createDataFrame(pdf, "s long, t long")
    out = connected_components(nodes, edges, "n", "s", "t", **kw)
    return {r["n"]: r["cluster_id"] for r in out.collect()}


def test_transitive_chain_and_singletons(spark):
    got = _cc(spark, 6, [(0, 1), (1, 2), (4, 5)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, 4, [])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, 10, [(i, i + 1) for i in range(9)], max_iterations=2)


def test_random_graph_matches_union_find(spark):
    rng = np.random.RandomState(37)
    n = 60
    edges = [
        (int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(40)
    ]
    got = _cc(spark, n, edges, max_iterations=30)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member of each component
    comp_min: dict[int, int] = {}
    for x in range(n):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in range(n)}
    assert got == want


def test_long_chain_converges_logarithmically(spark):
    """Pointer jumping must collapse a planted 100-node path in
    O(log diameter) rounds (6 label rounds + 1 no-change round), where
    one-hop propagation alone would need 99 — the r5 VERDICT scale
    fix for templated near-dup chains."""
    from spark_sklearn_spark.operators import components as C

    got = _cc(spark, 100, [(i, i + 1) for i in range(99)], max_iterations=10)
    assert got == {i: 0 for i in range(100)}
    assert C.LAST_ITERATIONS <= 7


def test_phantom_edge_endpoint_propagates_but_is_excluded(spark):
    """An edge endpoint missing from `nodes` must still CONNECT its
    neighbors (propagation runs through it) while being excluded from
    the output (the nodes contract)."""
    nodes = spark.createDataFrame(pd.DataFrame({"n": [1, 3]}), "n long")
    edges = spark.createDataFrame(
        pd.DataFrame({"s": [2, 2], "t": [1, 3]}), "s long, t long"
    )
    got = {
        r["n"]: r["cluster_id"]
        for r in connected_components(nodes, edges, "n", "s", "t").collect()
    }
    assert got == {1: 1, 3: 1}
