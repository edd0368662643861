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
