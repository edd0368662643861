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


@query(
    "join_bucketed_zero_exchange",
    section="§2.1/§2.3 bucketed DDL + co-located join — write-time hash "
    "bucketing makes the customer⋈orders join and the follow-on "
    "aggregation exchange-free (the Spark analogue of ColumnStore "
    "keeping data PM-local with no query-time shuffle at all, SURVEY "
    "§4 'no shuffle'; DDL surface: sources/ingest.write_bucketed ≈ "
    "CREATE TABLE .. CLUSTERED BY). tests/test_plan_shapes.py asserts "
    "the zero-Exchange plan; this row pins the results.",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 500
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def bucketed_zero_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed twins of customer/orders (8 buckets on the join key,
    sorted within buckets) are created once per session under the system
    temp dir, then joined + aggregated on the bucket key — at scale this
    is the pre-partitioning that removes the dominant shuffle from every
    query on the fact table's main key."""
    df, tbls = _bucketed_tables(spark, sf_dir)
    c, o = df
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        c.where(F.col("c_custkey") < 500)
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
        .orderBy("c_custkey")
    )


def _bucketed_tables(spark: SparkSession, sf_dir: str):
    """Idempotently materialize bucketed customer/orders twins for this
    (session, sf_dir); returns ((customer_df, orders_df), table names)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from mariadb_columnstore_engine_spark.sources.ingest import (
        write_bucketed,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    cust_tbl, ord_tbl = f"bkt_customer_{tag}", f"bkt_orders_{tag}"
    if not (
        spark.catalog.tableExists(cust_tbl)
        and spark.catalog.tableExists(ord_tbl)
    ):
        t = Catalog(spark, sf_dir)
        base = os.path.join(tempfile.gettempdir(), f"mcs_bkt_{tag}")
        shutil.rmtree(base, ignore_errors=True)
        write_bucketed(
            t.customer.select("c_custkey", "c_name"),
            cust_tbl,
            bucket_cols=["c_custkey"],
            n_buckets=8,
            sort_cols=["c_custkey"],
            path=os.path.join(base, "customer"),
        )
        write_bucketed(
            t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            ord_tbl,
            bucket_cols=["o_custkey"],
            n_buckets=8,
            sort_cols=["o_custkey"],
            path=os.path.join(base, "orders"),
        )
    return (spark.table(cust_tbl), spark.table(ord_tbl)), (cust_tbl, ord_tbl)
