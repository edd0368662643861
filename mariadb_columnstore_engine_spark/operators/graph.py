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


def _free_checkpoint(df: DataFrame | None) -> None:
    """Release a superseded localCheckpoint's storage blocks NOW.

    Fixpoint loops replace their checkpointed frame every round; the old
    rounds' MEMORY_AND_DISK blocks otherwise stay pinned until the JVM
    happens to GC the RDD handles — across a long session (or a 180-
    query sweep) that pile-up starves later broadcast builds (observed
    at sf1 as spurious 'Not enough memory to build and broadcast').
    Best-effort: the internals path (LogicalRDD.rdd) is stable across
    Spark 3.x/4.x but a refactor must degrade to the old GC-eventually
    behavior, never to an error."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


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
            _free_checkpoint(nxt)
            break
        old_visited, old_frontier = visited, frontier
        visited = (
            visited.unionByName(nxt)
            .repartition(_parts(n_visited + n_new), "node")
            .localCheckpoint()
        )
        n_visited = visited.count()
        frontier = nxt
        _free_checkpoint(old_visited)
        if old_frontier is not old_visited:
            _free_checkpoint(old_frontier)
    return visited


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components via min-label propagation: every node ends
    up labeled with the smallest node id in its component.

    This is the clustering step of a dedup pipeline — near-duplicate
    PAIRS (from LSH/SimHash candidate mining) become duplicate GROUPS,
    and the min label doubles as the canonical representative.

    Per iteration: one join (labels × edges) + one min-aggregate, both
    executor-side; the loop stops when an iteration changes no label
    (fixpoint) or at ``max_iter``. Convergence takes O(component
    diameter) rounds.

    DEFAULT STEER (r8 sf10 measurement, SCALE.md §Round-8 addendum):
    at real dedup densities the per-round join work dominates, and
    ``connected_components_star`` measured **4.5x faster** on the same
    sf10 pair graph (143.5 s vs 647.7 s) — use the star kernel as the
    cluster step at scale and keep THIS kernel as the simple
    correctness cross-check (its min label doubles as the canonical
    representative, which the oracle'd registry rows exploit). Plans
    are truncated per round with ``localCheckpoint`` (see
    bfs_reachability's discipline note).

    Returns (node, component) — component = min node id reachable.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Loop stages are |nodes|/|edges|-sized, NOT input-table-sized:
    # inheriting the session's shuffle partitioning (200 on a vanilla
    # session) makes every round pay hundreds of near-empty tasks.
    # Size the loop's partitioning from the edge count (~1M rows per
    # partition, the bfs_reachability discipline) — grows with the
    # graph at 100 TB, stays single-digit on fixture scales.
    p = max(1, sym.count() // 1_000_000 + 1)
    sym = sym.repartition(p, "a").localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .repartition(p, "node")
        .localCheckpoint()
    )
    # Convergence probe: labels only ever DECREASE, so sum(component)
    # is strictly monotone until the fixpoint — comparing two scalar
    # sums replaces a join+filter+count per round with one aggregate.
    def _label_sum(df: DataFrame):
        # decimal(38,0) so the probe can't overflow at 10^10 nodes
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # shuffle_hash hint: BOTH join sides are SF-scaled (labels =
        # every node, sym = every edge), so letting AQE broadcast the
        # frontier is wrong at scale — it re-broadcasts a growing
        # relation each round and trips the driver's broadcast-build
        # memory check long before 100 TB. A partitioned hash join
        # keeps consecutive rounds co-partitioned on the same key
        # (exchange reuse) with per-partition build memory only.
        neighbor_labels = labels.hint("shuffle_hash").join(
            sym, labels["node"] == sym["a"]
        ).select(F.col("b").alias("node"), "component")
        old_labels = labels
        # repartition BEFORE the aggregate: hash(node, p) satisfies the
        # aggregation's required distribution, so Catalyst elides the
        # agg's own (200-partition) exchange
        labels = (
            labels.unionByName(neighbor_labels)
            .repartition(p, "node")
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        new_sum = _label_sum(labels)
        _free_checkpoint(old_labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # A truncated run returns silently-wrong labels (one chain-shaped
        # component reported as several) — that must be an ERROR, unlike
        # bfs_reachability's depth cap which is a documented semantic.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (component diameter exceeds max_iter); raise "
            "max_iter or switch to large-star/small-star for long-chain "
            "graphs"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the DOCUMENTED DEFAULT cluster step for dedup pipelines at scale
    (r8 sf10 measurement: 4.5x faster than min-label on the same pair
    graph at 100x duplicate density — SCALE.md §Round-8 addendum),
    and the robust path for graphs whose component DIAMETER defeats
    min-label propagation: rounds grow O(log^2 n) in the worst case
    instead of O(diameter), so a million-node chain converges in tens
    of rounds, not a million.

    Per round each node re-attaches its larger (large-star) or
    not-larger (small-star) neighbors to the minimum of its closed
    neighborhood — two groupBy+join passes, everything executor-side,
    plans truncated per round (localCheckpoint discipline as above).
    Convergence = edge multiset stable (count + order-insensitive hash
    sum, two scalar aggregates).

    Returns (node, component) like connected_components.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    # loop partitioning sized from the graph, not the session (see
    # connected_components)
    p = max(1, e.count() // 1_000_000 + 1)
    all_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _sym(ed: DataFrame) -> DataFrame:
        return (
            ed.unionByName(
                ed.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            .repartition(p, "a")
            .distinct()
        )

    def _mins(sym: DataFrame) -> DataFrame:
        # min of the closed neighborhood Γ(u) ∪ {u}
        return (
            sym.groupBy("a")
            .agg(F.min("b").alias("_mn"))
            .select("a", F.least("a", "_mn").alias("m"))
        )

    def _large_star(ed: DataFrame) -> DataFrame:
        sym = _sym(ed)
        # shuffle_hash: both sides SF-scaled (see connected_components)
        j = sym.join(_mins(sym).hint("shuffle_hash"), "a")
        return (
            j.where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        sym = _sym(ed)
        mins = _mins(sym)
        j = sym.join(mins.hint("shuffle_hash"), "a")
        emit = j.where(F.col("b") <= F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        self_edge = mins.select(F.col("a"), F.col("m").alias("b"))
        return (
            emit.unionByName(self_edge)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def _sig(ed: DataFrame):
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = _sig(e)
    converged = False
    for _ in range(max_iter):
        old_e = e
        e = _small_star(_large_star(e)).localCheckpoint()
        new_sig = _sig(e)
        _free_checkpoint(old_e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (theoretical bound is O(log^2 n); raise max_iter)"
        )
    # converged edge set is a star forest: every non-root points at its
    # component root; roots (and isolated members of self-stars) get
    # themselves
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = all_nodes.join(
        labels.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return labels.unionByName(roots)
