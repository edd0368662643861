"""Set operations + distinct/order/limit/offset annex.

Reference analogue: TupleUnion does UNION / UNION ALL with hash-set dedup
and cross-type column normalization — int/uint/decimal/float/string
cross-casts so corresponding columns unify (dbcon/joblist/tupleunion.cpp:
83-230); INTERSECT/EXCEPT are a free upgrade (absent from joblist,
server-level fallback). DISTINCT / ORDER BY / LIMIT / OFFSET are the
TupleAnnexStep (tupleannexstep.cpp:467,516-540) and LimitedOrderBy top-k
(limitedorderby.cpp).

Spark's unionByName requires identical schemas, so the reference's type
normalization becomes explicit casts in the plan — done here with the
int32→int64 widening case.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query, sql_query


@query(
    "setop_union_all_normalized",
    section="§2.7 UNION ALL w/ cross-type normalization "
    "(tupleunion.cpp:83-230: int32 nationkey widened to int64)",
    oracle="""
    SELECT entity_key, acctbal, kind FROM (
        SELECT c_custkey AS entity_key, c_acctbal AS acctbal,
               'customer' AS kind
        FROM customer WHERE c_acctbal > 9990
        UNION ALL
        SELECT CAST(s_nationkey AS BIGINT) AS entity_key,
               s_acctbal AS acctbal, 'supplier' AS kind
        FROM supplier WHERE s_acctbal > 9900
    ) u
    ORDER BY kind, entity_key, acctbal
    """,
)
def union_all_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cust = t.customer.where(F.col("c_acctbal") > 9990).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = t.supplier.where(F.col("s_acctbal") > 9900).select(
        # the TupleUnion normalize step: widen int32 → int64 explicitly
        F.col("s_nationkey").cast("bigint").alias("entity_key"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp).orderBy("kind", "entity_key", "acctbal")


@query(
    "setop_union_distinct",
    section="§2.7 UNION (distinct) — hash-set dedup in TupleUnion",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9995
        UNION
        SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9950
    ) u
    ORDER BY nk
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 9995).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t.supplier.where(F.col("s_acctbal") > 9950).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.union(b).distinct().orderBy("nk")


@query(
    "setop_intersect",
    section="§2.7 INTERSECT (free upgrade; server fallback in reference)",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9900
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    ORDER BY nk
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 9900).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t.supplier.where(F.col("s_acctbal") > 8000).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.intersect(b).orderBy("nk")


@query(
    "setop_except_all",
    section="§2.7 EXCEPT ALL (bag semantics; free upgrade)",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9990
        EXCEPT ALL
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    ) e
    ORDER BY nk
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 9990).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t.supplier.where(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.exceptAll(b).orderBy("nk")


sql_query(
    "setop_distinct_limit_offset",
    """
    SELECT DISTINCT o_orderpriority
    FROM orders
    ORDER BY o_orderpriority
    LIMIT 3 OFFSET 1
    """,
    section="§2.6 DISTINCT + ORDER BY + LIMIT/OFFSET annex "
    "(tupleannexstep.cpp:467,516-540)",
)


@query(
    "setop_order_nulls_first_last",
    section="§2.6 NULLS FIRST/LAST ordering (IdbOrderBy comparator, "
    "idborderby.cpp; NULLs injected via nullif)",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null
    FROM orders
    WHERE o_orderkey < 40
    ORDER BY status_or_null NULLS FIRST, o_orderkey DESC
    """,
)
def order_nulls_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.where(F.col("o_orderkey") < 40)
        .select(
            "o_orderkey",
            F.nullif("o_orderstatus", F.lit("P")).alias("status_or_null"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_orderkey").desc(),
        )
    )


@query(
    "setop_intersect_all",
    section="§2.7 INTERSECT ALL (bag semantics; free upgrade — reference "
    "has no INTERSECT at all, server fallback)",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        INTERSECT ALL
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    ) i
    ORDER BY nk
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t.supplier.where(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.intersectAll(b).orderBy("nk")


@query(
    "setop_except_distinct",
    section="§2.7 EXCEPT (set semantics — pairs with setop_except_all)",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9900
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    ) e
    ORDER BY nk
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") > 9900).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t.supplier.where(F.col("s_acctbal") > 8000).select(
        F.col("s_nationkey").alias("nk")
    )
    return a.subtract(b).orderBy("nk")


sql_query(
    "setop_cte_window_union",
    """
    WITH cust_orders AS (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM customer JOIN orders ON c_custkey = o_custkey
    )
    SELECT c_mktsegment AS segment, CAST(rk AS INTEGER) AS rk,
           round(o_totalprice, 2) AS price
    FROM cust_orders WHERE rk <= 3
    UNION ALL
    SELECT 'ALL' AS segment, CAST(0 AS INTEGER) AS rk,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS price
    FROM orders
    ORDER BY segment, rk
    """,
    section="§2.6/§2.7 SQL front end: CTE + window top-k + UNION ALL in "
    "one pushed statement (ha_mcs_pushdown full-statement path) — the "
    "identical ANSI text runs through Spark's parser/analyzer and DuckDB. "
    "The ALL-total carries DECIMAL(18,2) so both engines accumulate "
    "exactly (r11: a 1.5M-row double sum at sf1 straddled the "
    "cents-rounding boundary run-to-run); the top-3 prices are single "
    "2-decimal doubles, exact under round(,2) by construction.",
)
