"""Recursive-query operator: bounded-fixpoint BFS over an edge table.

Reference analogue: MariaDB supports ``WITH RECURSIVE`` but ColumnStore
does not push it down (recursive CTEs fall back to the server row-by-row
path); Spark has no recursive CTE either. This operator fills that gap
the Spark-idiomatic way: a driver-side loop of distributed joins with a
fixpoint/size-based stop — each iteration is one shuffle join + distinct
(all executor-side, nothing collected but the LOOP CONDITION's count).

Scale notes: per iteration the frontier joins the edge table on the
source key — shuffle bounded by frontier × out-degree; `visited` grows
monotonically and is checkpointed every few iterations via ``.cache()``
+ count (materialization) so lineage doesn't deepen unboundedly (the
classic iterative-algorithm trap on Spark). Iterations are bounded by
``max_iter`` (graph diameter), not data size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bfs_reachability(
    edges: DataFrame,
    start_nodes: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_iter: int = 20,
) -> DataFrame:
    """All nodes reachable from ``start_nodes`` with their BFS depth
    (minimum hop count). Deterministic: depth of a node is the iteration
    at which it first appears.

    Returns a DataFrame (node, depth).
    """
    def _parts(n_rows: int) -> int:
        # ~1M nodes per partition; tiny graphs stay single-partition so a
        # 200-shuffle-partition session doesn't accumulate thousands of
        # near-empty tasks across iterations
        return max(1, n_rows // 1_000_000 + 1)

    # localCheckpoint (eager), NOT cache: cache short-circuits execution
    # but the LOGICAL plan still nests the whole history — after ~15
    # iterations the plan tree is exponential and the driver OOMs just
    # STRINGIFYING it. Checkpointing truncates the plan each iteration —
    # the standard fixpoint-loop discipline on Spark (GraphFrames does
    # the same). On a cluster with reliable storage, swap for
    # df.checkpoint() to also survive executor loss.
    visited = (
        start_nodes.select(F.col(node).alias("node"), F.lit(0).alias("depth"))
        .distinct()
        .repartition(1, "node")
        .localCheckpoint()
    )
    n_visited = visited.count()
    frontier = visited
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_to"))
    for it in range(1, max_iter + 1):
        nxt = (
            frontier.join(e, "node")
            .select(F.col("_to").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(it).alias("depth"))
            .repartition(_parts(n_visited), "node")
            .localCheckpoint()
        )
        n_new = nxt.count()
        if n_new == 0:
            break
        visited = (
            visited.unionByName(nxt)
            .repartition(_parts(n_visited + n_new), "node")
            .localCheckpoint()
        )
        n_visited = visited.count()
        frontier = nxt
    return visited
