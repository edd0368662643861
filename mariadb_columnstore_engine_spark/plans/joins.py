"""Join-type surface: outer / semi / anti / theta / cross.

Reference analogue: TupleHashJoinStep's join-type lattice INNER,
LARGEOUTER, SMALLOUTER, SEMI, ANTI, SCALAR, MATCHNULLS
(dbcon/joblist/joblisttypes.h:90-93, tuplehashjoin.h:43). LEFT/RIGHT/FULL
outer are LARGEOUTER/SMALLOUTER combinations; SEMI/ANTI serve subquery
rewrites (jlf_subquery.cpp). Theta (non-equi) join exists in the reference
only as a post-join filter expression (WITHFCNEXP + fe2,
joblisttypes.h:93); Spark covers it natively with broadcast-nested-loop.

Scale notes: every query here keeps the big fact table on the streaming
side and lets AQE choose broadcast vs shuffle for SF-scaled dimensions;
only constant-size inputs (nation: 25 rows, literal band tables) carry
explicit broadcast hints.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query


@query(
    "join_left_outer_order_counts",
    section="§2.3 LEFT outer join (LARGEOUTER), TPC-H Q13 shape",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    orders = t.orders.where(F.col("o_orderpriority") != "1-URGENT")
    return (
        t.customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "join_right_outer_supplier_nation",
    section="§2.3 RIGHT outer join (SMALLOUTER)",
    oracle="""
    SELECT n_name, count(s_suppkey) AS n_rich_suppliers
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 9000
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.supplier.join(
            t.nation,
            (F.col("s_nationkey") == F.col("n_nationkey"))
            & (F.col("s_acctbal") > 9000),
            "right",
        )
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_rich_suppliers"))
        .orderBy("n_name")
    )


@query(
    "join_full_outer_nation_balances",
    section="§2.3 FULL outer join (LARGEOUTER|SMALLOUTER)",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nk, count(*) AS n_cust
        FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
    ), s AS (
        SELECT s_nationkey AS nk, count(*) AS n_supp
        FROM supplier WHERE s_acctbal < 100 GROUP BY s_nationkey
    )
    SELECT coalesce(c.nk, s.nk) AS nationkey, n_cust, n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
)
def full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    c = (
        t.customer.where(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t.supplier.where(F.col("s_acctbal") < 100)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.c_nk == s.s_nk, "full")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"), "n_cust", "n_supp"
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi_customers_with_f_orders",
    section="§2.3 SEMI join (subquery IN/EXISTS rewrite target)",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    f_orders = t.orders.where(F.col("o_orderstatus") == "F")
    return (
        t.customer.join(
            f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_anti_customers_without_orders",
    section="§2.3 ANTI join (NOT EXISTS rewrite target)",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    big_orders = t.orders.where(F.col("o_totalprice") > 300000)
    return (
        t.customer.join(
            big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_theta_band",
    section="§2.3 theta/non-equi join (WITHFCNEXP post-join filter analogue)",
    oracle="""
    SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
    FROM part
    JOIN (VALUES ('small', 0, 15), ('medium', 16, 35), ('large', 36, 1000))
         b(band, lo, hi)
      ON p_size BETWEEN lo AND hi
    GROUP BY band
    ORDER BY band
    """,
)
def theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # Constant-size band table → explicit broadcast turns the non-equi
    # join into a broadcast-nested-loop instead of a cartesian shuffle.
    bands = spark.createDataFrame(
        [("small", 0, 15), ("medium", 16, 35), ("large", 36, 1000)],
        ["band", "lo", "hi"],
    )
    return (
        t.part.join(
            F.broadcast(bands), F.col("p_size").between(F.col("lo"), F.col("hi"))
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "join_cross_region_priorities",
    section="§2.3 cross join (cartesian; server-side fallback in reference)",
    oracle="""
    SELECT r_name, p AS priority
    FROM region
    CROSS JOIN (VALUES ('1-URGENT'), ('5-LOW')) t(p)
    ORDER BY r_name, priority
    """,
)
def cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    prios = spark.createDataFrame([("1-URGENT",), ("5-LOW",)], ["priority"])
    return (
        t.region.crossJoin(F.broadcast(prios))
        .select("r_name", "priority")
        .orderBy("r_name", "priority")
    )
