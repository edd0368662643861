"""TPC-H-style headline queries.

These mirror the reference's de-facto regression corpus: TPC-H SF1 golden
queries (mysql-test/columnstore/devregression/t/mcs7536_q4_2.test:1-12).
Adapted to the driver fixture schemas (FIXTURES.md) — e.g. ``orders`` has
``o_orderpriority`` instead of ``o_shippriority``.

Each query exercises the reference's core execution path end-to-end:
pColScanStep scan + pushed filters → TupleBPS → PM partial agg → UM final
agg → TupleAnnexStep sort/limit (SURVEY §2.1, §2.4, §2.6), all of which
Catalyst provides as parquet pushdown → partial/final HashAggregate →
TakeOrderedAndProject.

Float policy for oracle parity: aggregate outputs are rounded in BOTH the
Spark plan and the DuckDB SQL (2 dp for currency sums, 6 dp for averages).
Summation order differs between engines; rounding absorbs the ~1e-9
relative float drift while keeping values bit-comparable. Top-k queries
order by the UNROUNDED aggregate (plus a key tiebreak) in both engines and
round only in the final projection, so a value sitting on a .xx5 rounding
boundary near the LIMIT cutoff cannot select different rows per engine.

Scale policy: explicit ``F.broadcast`` hints are used only for the
constant-size dimensions (region: 5 rows, nation: 25 rows at every SF).
customer/supplier/orders grow linearly with SF, so their join strategy is
left to AQE (session.py enables it), which broadcasts while the runtime
size fits ``autoBroadcastJoinThreshold`` and falls back to shuffle joins
beyond — the same decision the reference's ResourceManager makes between
PM (broadcast) and UM (partitioned) joins (tuplehashjoin.h:503).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query


@query(
    "tpch_q1_pricing_summary",
    section="§2.1 scan, §2.2 filter pushdown, §2.4 two-phase agg, §2.6 sort",
    bench=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        t.lineitem.where(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    section="§2.3 hash join (broadcast small dim), §2.4 agg, §2.6 top-k",
    bench=True,
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING")
    orders = t.orders.where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t.lineitem.where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # No broadcast hint: customer grows with SF, so AQE picks broadcast
        # while it fits and shuffle-hash beyond (≈ PM vs UM join choice).
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_revenue"
            )
        )
        .orderBy(F.desc("_revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round("_revenue", 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    section="§2.3 multi-way join w/ join ordering, §2.4 agg",
    bench=True,
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    region = t.region.where(F.col("r_name") == "ASIA")
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        # supplier scales with SF — no hint; AQE decides (see module policy).
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6_forecast_revenue",
    section="§2.1 scan w/ multi-predicate pushdown, §2.4 scalar agg",
    bench=True,
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q10_returned_items",
    section="§2.3 join, §2.4 agg w/ wide group key, §2.6 top-k",
    bench=True,
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t.lineitem.where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_revenue"
            )
        )
        .orderBy(F.desc("_revenue"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("_revenue", 2).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )
