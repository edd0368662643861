"""bfs_reachability unit tests: cycles terminate, depths are minimal,
unreachable nodes are absent, multi-source works."""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.operators.graph import bfs_reachability


def _bfs(spark, edge_list, starts, max_iter=10):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    start = spark.createDataFrame([(s,) for s in starts], "node long")
    out = bfs_reachability(edges, start, max_iter=max_iter)
    return {r.node: r.depth for r in out.collect()}


def test_cycle_terminates_and_depths_minimal(spark):
    # 0→1→2→0 cycle plus a shortcut 0→2: depth(2) must be 1, not 2
    got = _bfs(spark, [(0, 1), (1, 2), (2, 0), (0, 2)], [0])
    assert got == {0: 0, 1: 1, 2: 1}


def test_unreachable_nodes_absent(spark):
    got = _bfs(spark, [(0, 1), (5, 6)], [0])
    assert got == {0: 0, 1: 1}


def test_multi_source_min_depth(spark):
    # chain 0→1→2→3; starting {0, 3}: depth(3)=0 wins over path depth
    got = _bfs(spark, [(0, 1), (1, 2), (2, 3)], [0, 3])
    assert got == {0: 0, 3: 0, 1: 1, 2: 2}


def test_max_iter_bounds_depth(spark):
    got = _bfs(spark, [(i, i + 1) for i in range(8)], [0], max_iter=3)
    assert set(got) == {0, 1, 2, 3}


def _cc(spark, edges, **kw):
    from mariadb_columnstore_engine_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.node: r.component for r in connected_components(df, **kw).collect()
    }


def test_components_chain_converges(spark):
    # a long chain needs multiple propagation rounds (diameter > 1)
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_components_two_clusters_and_direction_blind(spark):
    # edge direction must not matter; min id labels each component
    got = _cc(spark, [(5, 3), (3, 9), (20, 21), (22, 21)])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_components_clique_single_round(spark):
    got = _cc(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_cc_matches_min_propagation_random(spark):
    """large-star/small-star and min-label propagation must agree on
    random graphs (clusters + bridges + isolated pairs)."""
    import random

    from mariadb_columnstore_engine_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = []
    for base in range(0, 120, 12):  # ten 12-node neighborhoods
        nodes = list(range(base, base + 12))
        for _ in range(14):
            edges.append(tuple(rng.sample(nodes, 2)))
    edges += [(11, 12), (47, 48)]  # bridges merging some clusters
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {
        r.node: r.component
        for r in connected_components(df, max_iter=30).collect()
    }
    b = {
        r.node: r.component
        for r in connected_components_star(df).collect()
    }
    assert a == b


def test_star_cc_converges_on_long_chain(spark):
    """A 60-node chain: min-propagation needs ~60 rounds (and must now
    RAISE at its default budget), while star contraction converges in
    O(log^2 n) rounds and labels the whole chain as one component."""
    import pytest

    from mariadb_columnstore_engine_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(chain, "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=10)
    got = connected_components_star(df).collect()
    assert len(got) == 61
    assert {r.component for r in got} == {0}
