"""Subquery surface: EXISTS / IN / NOT IN (null-aware) / scalar /
SELECT-list / HAVING / derived tables.

Reference analogue: the plugin classifies subqueries into
FROM/IN/EXISTS/SCALAR/SELECT kinds (dbcon/mysql/ha_*_sub.cpp) and joblist
rewrites them to SEMI/ANTI/SCALAR joins — handleNotIn with MATCHNULLS for
the null-aware case (dbcon/joblist/jlf_subquery.cpp:287), EXISTS→semi at
:372,637, scalar filter at :601, SELECT-list subquery at :462, HAVING at
:710, derived tables via SubQueryStep (subquerystep.h:38).

On Spark the same rewrites are Catalyst's RewritePredicateSubquery /
DecorrelateInnerQuery, reached here through ``spark.sql`` (shared-SQL
queries, which double as the oracle text) — plus DataFrame-level
decorrelations where that is the idiomatic scale-first plan (Q17 shape:
precompute per-key aggregates and join, instead of a per-row correlated
probe).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query, sql_query

# --- shared-SQL queries: Spark runs the identical statement as the oracle ---

sql_query(
    "subq_exists_correlated_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    section="§2.9 correlated EXISTS → SEMI join (jlf_subquery.cpp:372)",
)

sql_query(
    "subq_not_in_null_trap",
    """
    SELECT count(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_custkey % 2 = 0 THEN NULL ELSE o_custkey END
        FROM orders
    )
    """,
    section="§2.9 null-aware NOT IN → ANTI+MATCHNULLS (jlf_subquery.cpp:287): "
    "a NULL in the subquery makes NOT IN UNKNOWN for every row ⇒ 0",
)

sql_query(
    "subq_not_in_anti",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    section="§2.9 NOT IN over non-null subquery → ANTI join",
)

sql_query(
    "subq_in_semi",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    section="§2.9 uncorrelated IN → SEMI join",
)

sql_query(
    "subq_scalar_in_select_list",
    """
    SELECT r_name,
           (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
               AS n_nations
    FROM region
    ORDER BY r_name
    """,
    section="§2.9 SELECT-list correlated subquery (jlf_subquery.cpp:462)",
)

sql_query(
    "subq_having_scalar_q11",
    """
    SELECT l_partkey, round(pv, 2) AS part_value
    FROM (
        SELECT l_partkey, sum(l_extendedprice) AS pv
        FROM lineitem
        GROUP BY l_partkey
        HAVING sum(l_extendedprice) > (
            SELECT sum(l_extendedprice) * 0.0006 FROM lineitem
        )
        ORDER BY pv DESC, l_partkey
        LIMIT 20
    ) top_parts
    """,
    section="§2.9 HAVING scalar subquery (jlf_subquery.cpp:710), Q11 shape",
)


# --- DataFrame-level decorrelations (the scale-first plan) ---


@query(
    "subq_scalar_filter_avg",
    section="§2.9 uncorrelated scalar subquery as filter "
    "(jlf_subquery.cpp:601 doSimpleScalarFilter)",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_above
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def scalar_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # One-row aggregate broadcast-joined to every partition — the SCALAR
    # join flag in the reference; a 1-row broadcast at any SF.
    avg_bal = t.customer.agg(F.avg("c_acctbal").alias("_avg"))
    return (
        t.customer.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_above"))
        .orderBy("c_mktsegment")
    )


@query(
    "subq_correlated_scalar_q17",
    section="§2.9 correlated scalar subquery decorrelated to agg+join "
    "(TPC-H Q17 shape; SCALAR+CORRELATED join flags)",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size = 1
      AND l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # Decorrelated: per-part thresholds computed once (partial agg map-side,
    # one shuffle on l_partkey), then joined — no per-row re-aggregation.
    # l_quantity is integer-valued, so per-group sums are exact in double
    # and avg is deterministic across engines/summation orders.
    small_parts = t.part.where(F.col("p_size") == 1).select("p_partkey")
    thresholds = (
        t.lineitem.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("_qty_limit"))
        .withColumnRenamed("l_partkey", "_t_partkey")
    )
    return (
        t.lineitem.join(
            small_parts, F.col("l_partkey") == F.col("p_partkey")
        )
        .join(thresholds, F.col("l_partkey") == F.col("_t_partkey"))
        .where(F.col("l_quantity") < F.col("_qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "subq_derived_table_items_per_order",
    section="§2.9 derived table (FROM subquery) → SubQueryStep "
    "(subquerystep.h:38)",
    oracle="""
    SELECT o_orderstatus,
           round(avg(n_items), 4) AS avg_items,
           max(n_items) AS max_items
    FROM (
        SELECT o_orderkey, o_orderstatus, count(*) AS n_items
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderstatus
    ) per_order
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    per_order = (
        t.orders.join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    return (
        per_order.groupBy("o_orderstatus")
        .agg(
            F.round(F.avg("n_items"), 4).alias("avg_items"),
            F.max("n_items").alias("max_items"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "subq_recursive_bfs_reachability",
    section="§2.9 recursive CTE analogue — MariaDB WITH RECURSIVE is NOT "
    "pushed down by the reference (server fallback); Spark has no "
    "recursive CTE, so the engine provides a bounded-fixpoint BFS "
    "operator (operators/graph.py: distributed join per iteration, "
    "cache+count lineage cuts). Oracle = DuckDB's native WITH RECURSIVE "
    "over the same derived edge table",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst
        FROM nation
        UNION ALL
        SELECT n_nationkey, (n_nationkey * 3 + 7) % 25 FROM nation
    ),
    r AS (
        SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
        UNION
        SELECT e.dst, r.depth + 1
        FROM r JOIN e ON e.src = r.node
        WHERE r.depth < 20
    )
    SELECT node, CAST(min(depth) AS INT) AS depth
    FROM r GROUP BY node ORDER BY node
    """,
)
def recursive_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.operators.graph import (
        bfs_reachability,
    )

    t = Catalog(spark, sf_dir)
    k = F.col("n_nationkey")
    edges = t.nation.select(
        k.alias("src"), ((k * 2 + 1) % 25).alias("dst")
    ).unionByName(
        t.nation.select(k.alias("src"), ((k * 3 + 7) % 25).alias("dst"))
    )
    start = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return (
        bfs_reachability(edges, start, max_iter=20)
        .select("node", F.col("depth").cast("int").alias("depth"))
        .orderBy("node")
    )
