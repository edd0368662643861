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
from pyspark.sql import Column, DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query

# --- exact money arithmetic -------------------------------------------------
# TPC-H money/discount columns are 2-dp by definition; float double-sums can
# land on half-cent boundaries where Spark's and DuckDB's round() flip the
# last digit (first seen at the sf1 sweep: q1 sum_charge, q7 revenue). Every
# revenue aggregate therefore sums exact BIGINT hundredth-cents and converts
# to dollars with ONE half-up integer division — bit-identical in both
# engines at any scale; sums stay exact to ~9e18 units ≈ sf1000.

_REV4_SQL = (
    "(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))"
)
_DISC4_SQL = (
    "(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * CAST(round(l_discount * 100, 0) AS BIGINT))"
)


def _rev4() -> Column:
    """l_extendedprice * (1 - l_discount), exact, in 1e-4 dollars."""
    ep = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d = F.round(F.col("l_discount") * 100, 0).cast("long")
    return ep * (100 - d)


def _disc4() -> Column:
    """l_extendedprice * l_discount, exact, in 1e-4 dollars."""
    ep = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d = F.round(F.col("l_discount") * 100, 0).cast("long")
    return ep * d


def _dollars2(sum_col: str) -> Column:
    """Half-up 1e-4-dollar BIGINT sum → 2-dp dollars (double). The
    division uses a Python float literal (a SQL-text 100.0 would parse
    as DECIMAL and type the output decimal(27,6) — driver-unhashable)."""
    return F.expr(f"({sum_col} + 50) DIV 100") / 100.0


def _dollars2_sql(inner: str) -> str:
    return f"((CAST(sum({inner}) AS BIGINT) + 50) // 100) / 100.0"


@query(
    "tpch_q1_pricing_summary",
    section="§2.1 scan, §2.2 filter pushdown, §2.4 two-phase agg, §2.6 sort",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ep_c,
               CAST(round(l_discount * 100, 0) AS BIGINT)      AS d_p,
               CAST(round(l_tax * 100, 0) AS BIGINT)           AS t_p,
               CAST(l_quantity AS BIGINT)                      AS qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ), g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(qty) AS BIGINT)                          AS sq,
               CAST(sum(ep_c) AS BIGINT)                         AS sbp,
               CAST(sum(ep_c * (100 - d_p)) AS BIGINT)           AS sdp4,
               CAST(sum(ep_c * (100 - d_p) * (100 + t_p)) AS BIGINT) AS sc6,
               CAST(sum(d_p) AS BIGINT)                          AS sd,
               count(*)                                          AS n
        FROM c GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sq AS DOUBLE)                      AS sum_qty,
           sbp / 100.0                             AS sum_base_price,
           ((sdp4 + 50) // 100) / 100.0            AS sum_disc_price,
           ((sc6 + 5000) // 10000) / 100.0         AS sum_charge,
           round(CAST(sq AS DOUBLE) / n, 6)        AS avg_qty,
           round(sbp / 100.0 / n, 6)               AS avg_price,
           round(sd / 100.0 / n, 6)                AS avg_disc,
           n                                       AS count_order
    FROM g
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregates run in EXACT integer cents (prices/discounts/tax
    are 2-dp by TPC-H definition): float double-sums round-flip on
    half-cent boundaries at sf1 (caught by the 100x sweep — sum_charge
    .34 vs .35), while bigint sums + a single half-up integer division
    are bit-identical in both engines at any scale. Sums stay exact up
    to ~9e18 hundredth-cents ≈ sf1000."""
    t = Catalog(spark, sf_dir)
    ep_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d_p = F.round(F.col("l_discount") * 100, 0).cast("long")
    t_p = F.round(F.col("l_tax") * 100, 0).cast("long")
    qty = F.col("l_quantity").cast("long")
    return (
        t.lineitem.where(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sq"),
            F.sum(ep_c).alias("sbp"),
            F.sum(ep_c * (100 - d_p)).alias("sdp4"),
            F.sum(ep_c * (100 - d_p) * (100 + t_p)).alias("sc6"),
            F.sum(d_p).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sq").cast("double").alias("sum_qty"),
            (F.col("sbp") / 100.0).alias("sum_base_price"),
            (F.expr("(sdp4 + 50) DIV 100") / 100.0).alias("sum_disc_price"),
            (F.expr("(sc6 + 5000) DIV 10000") / 100.0).alias("sum_charge"),
            F.round(F.col("sq").cast("double") / F.col("n"), 6).alias("avg_qty"),
            F.round(F.col("sbp") / 100.0 / F.col("n"), 6).alias("avg_price"),
            F.round(F.col("sd") / 100.0 / F.col("n"), 6).alias("avg_disc"),
            F.col("n").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    section="§2.3 hash join (broadcast small dim), §2.4 agg, §2.6 top-k",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle=f"""
    SELECT l_orderkey,
           {_dollars2_sql(_REV4_SQL)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REV4_SQL}) DESC, l_orderkey
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
        .agg(F.sum(_rev4()).alias("_rev4"))
        .orderBy(F.desc("_rev4"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            _dollars2("_rev4").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    section="§2.3 multi-way join w/ join ordering, §2.4 agg",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle=f"""
    SELECT n_name,
           {_dollars2_sql(_REV4_SQL)} AS revenue
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
        .agg(F.sum(_rev4()).alias("_rev4"))
        .select("n_name", _dollars2("_rev4").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6_forecast_revenue",
    section="§2.1 scan w/ multi-predicate pushdown, §2.4 scalar agg",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle=f"""
    SELECT {_dollars2_sql(_DISC4_SQL)} AS revenue
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
        .agg(F.sum(_disc4()).alias("_d4"))
        .select(_dollars2("_d4").alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    section="§2.3 join, §2.4 agg w/ wide group key, §2.6 top-k",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dollars2_sql(_REV4_SQL)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV4_SQL}) DESC, c_custkey
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
        .agg(F.sum(_rev4()).alias("_rev4"))
        .orderBy(F.desc("_rev4"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            _dollars2("_rev4").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@query(
    "tpch_q7_volume_shipping",
    section="§2.3 multi-join nation pairs + §2.8 year() + OR-pair filter "
    "(TPC-H Q7 shape, devregression corpus)",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           ((CAST(sum(vol4) AS BIGINT) + 50) // 100) / 100.0 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {_REV4_SQL} AS vol4
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        t.lineitem.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev4()).alias("_rev4"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            _dollars2("_rev4").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q12_priority_buckets",
    section="§2.8 CASE-bucketed conditional aggregation (TPC-H Q12 shape "
    "adapted: o_orderpriority buckets instead of shipmode)",
    oracle="""
    SELECT year(l_shipdate) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'N'
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(
            t.lineitem.where(F.col("l_returnflag") == "N"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "tpch_q14_promo_revenue",
    section="§2.8 conditional ratio aggregate (TPC-H Q14 shape: PROMO "
    "share of revenue)",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q16_supplier_counts",
    section="§2.4 COUNT(DISTINCT) + §2.9 NOT IN subquery (TPC-H Q16 shape)",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size IN (1, 5, 9, 13)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 25
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    bad_supp = t.supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t.part.where(F.col("p_size").isin(1, 5, 9, 13))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(25)
    )


@query(
    "tpch_q18_large_orders",
    section="§2.9 IN over grouped HAVING subquery (TPC-H Q18 shape)",
    # bench anchor (r12, VERDICT r11 #4): the headline set covered
    # scan/agg/join/window/events/text/sim but no §2.9 shape — Q18
    # stresses the semi-join over a derived grouped-HAVING aggregate.
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 optimization (guide §1.2 step 1 — remove a full pass): the
    literal IN-subquery plan scanned lineitem TWICE (the HAVING
    aggregate, then the probe side), semi-joined, and re-aggregated
    the surviving lineitems to recover the per-order quantity it had
    already computed. The per-order SUM is computed ONCE and joined
    back instead. Equivalence: the outer GROUP BY's grain is
    o_orderkey (orders⋈customer is 1:1 per order), so its
    sum(l_quantity) over the semi-join survivors IS the HAVING
    aggregate's value for that order; l_quantity is integral by TPC-H
    definition, so the double sums are exact regardless of
    accumulation order — bit-identical to the oracle's two-pass
    spelling. Oracle SQL unchanged (still the IN-subquery shape);
    the semi-join plan family keeps its own evidence rows
    (subq_in_semi, join_semi_customers_with_f_orders)."""
    t = Catalog(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 150)
    )
    # r13 (guide §3.1): the orders side is hinted to a sort-merge join.
    # Both join sides are SF-scaled — the filtered aggregate keeps ~20%
    # of all orders (292,940 of 1.5 M at sf1) — so a broadcast is wrong
    # at 100 TB by construction; locally the planner's 64 MB threshold
    # still chose to broadcast FULL orders at sf1, paying a
    # single-threaded 1.5 M-entry hashed-relation build (measured:
    # 1.44-1.63 s total vs 0.88 s with the hint; sf0.1 statistically
    # unchanged, 0.395 vs 0.42 interleaved medians). SMJ also spills
    # natively — the reference's DiskJoinStep degradation — where a
    # forced hash build could not.
    return (
        big.join(
            t.orders.hint("merge"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", F.round(F.col("_q"), 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    section="§2.9 NOT EXISTS + scalar avg subquery + §2.8 substring "
    "(TPC-H Q22 shape: customers with no orders above-average balance)",
    oracle="""
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               / 100.0 AS totacctbal
    FROM (
        SELECT substr(c_name, 10, 2) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 400000
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    avg_bal = (
        t.customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("_avg"))
    )
    big_orders = t.orders.where(F.col("o_totalprice") > 400000)
    return (
        t.customer.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(
            big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
                / 100.0
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "tpch_q13_customer_distribution",
    section="§2.3 LEFT OUTER join with ON-clause extra predicate, §2.4 "
    "two-level aggregation (TPC-H Q13 adapted: o_orderpriority filter "
    "replaces the comment NOT LIKE; fixtures carry no o_comment)",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q19_discounted_revenue",
    section="§2.2 disjunctive multi-table predicates (TPC-H Q19 adapted "
    "to fixture columns: brand/size/type OR-branches). The OR of ANDs "
    "must still push the join-independent part into the scans",
    oracle=f"""
    SELECT {_dollars2_sql(_REV4_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 5 AND 25)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_type = 'PROMO' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 1 AND 30)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(1, 30)
        )
    )
    return (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(_rev4()).alias("_rev4"))
        .select(_dollars2("_rev4").alias("revenue"))
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    section="§2.9 EXISTS + NOT EXISTS double correlation (TPC-H Q21 "
    "adapted: returned-items variant — fixtures carry no commit/receipt "
    "dates, so 'late' is l_returnflag = 'R'). Spark-first rewrite: the "
    "two correlated self-joins collapse into ONE per-order aggregate "
    "(distinct suppliers / distinct returning suppliers) joined back — "
    "one shuffle instead of two self-join probes "
    "(jlf_subquery.cpp:372,392 EXISTS→SEMI; 637 NOT EXISTS→ANTI)",
    oracle="""
    SELECT s_name, n_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # Per-order stats: EXISTS(other supplier) ⇔ n_supp ≥ 2;
    # NOT EXISTS(other returning supplier) ⇔ n_ret_supp = 1 (l1 itself
    # is a returning row, so a singleton returning set is exactly l1's).
    order_stats = t.lineitem.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = t.lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    forders = t.orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    return (
        l1.join(forders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            order_stats.where(
                (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
            ),
            "l_orderkey",
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "tpch_q8_market_share",
    section="§2.3 6-table join + conditional aggregation (TPC-H Q8 "
    "adapted: market share of one nation inside one region's customers "
    "for one part type; volume in exact cents for hash-stable division)",
    oracle="""
    WITH vol AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS cents,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                              THEN cents ELSE 0 END) AS DOUBLE)
                 / sum(cents), 6) AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    n1 = t.nation.alias("n1")
    n2 = t.nation.alias("n2")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    vol = (
        t.part.where(F.col("p_type") == "PROMO")
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(n1),
            F.col("c_nationkey") == F.col("n1.n_nationkey"),
        )
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            F.broadcast(n2),
            F.col("s_nationkey") == F.col("n2.n_nationkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(
            0
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                nation_cents.cast("double") / F.sum("cents"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q15_top_supplier",
    section="§2.9 view + scalar-max selection (TPC-H Q15: revenue view, "
    "suppliers achieving the maximum). Spark-first: the view is a CTE "
    "DataFrame, max is a scalar subquery — no double scan of lineitem "
    "beyond the two the spec itself requires",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                    * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_cents / 100.0, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    revenue = (
        t.lineitem.where(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents).cast("long").alias("total_cents"))
    )
    max_rev = revenue.agg(F.max("total_cents").alias("m"))
    return (
        revenue.join(
            F.broadcast(max_rev),
            F.col("total_cents") == F.col("m"),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_cents") / 100.0, 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q9_product_profit",
    section="§2.4 profit aggregation over a 5-table join (TPC-H Q9 "
    "adapted: fixtures ship no partsupp, so supply cost is derived as "
    "60% of p_retailprice — the join/expression/group shape is intact; "
    "profit summed in exact cents)",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(CAST(sum(CAST(round(
               (l_extendedprice * (1 - l_discount)
                - p_retailprice * 0.6 * l_quantity) * 100, 0)
               AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    -- group by the source column: bare "nation" would resolve to the
    -- TABLE nation, not the output alias
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("long")
    return (
        t.part.where(F.col("p_name").like("%widget%"))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit_cents).cast("long") / 100.0, 2).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q20_excess_shippers",
    section="§2.9 nested IN-subquery chain (TPC-H Q20 adapted: partsupp "
    "availqty becomes lineitem-derived volume — suppliers who shipped "
    "more than half of some widget part's 1996 volume; supplier IN "
    "(... part IN (...) ... correlated half-volume threshold ...))",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l1.l_suppkey FROM lineitem l1
        WHERE l1.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
        )
        AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l1.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l1.l_suppkey, l1.l_partkey
        -- correlation must name the OUTER alias: a bare l_partkey
        -- inside the subquery binds to l2 (always-true self-compare)
        HAVING sum(l1.l_quantity) > (
            SELECT 0.5 * sum(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        )
    )
    ORDER BY s_name
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated half-volume HAVING decorrelates into one window
    over (partkey): per-(supplier, part) volume vs 0.5 × per-part total,
    computed in a single pass — no per-row re-aggregation probe."""
    from pyspark.sql import Window

    t = Catalog(spark, sf_dir)
    widget_parts = t.part.where(F.col("p_name").like("%widget%")).select(
        "p_partkey"
    )
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).join(
        F.broadcast(widget_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("sp_qty")
    )
    w = Window.partitionBy("l_partkey")
    shippers = (
        per_sp.withColumn("part_qty", F.sum("sp_qty").over(w))
        .where(F.col("sp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t.supplier.join(
            shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q2_min_cost_supplier",
    section="§2.9 correlated MIN scalar subquery over a 5-table join "
    "(TPC-H Q2 adapted: fixtures ship no partsupp, so supply cost is the "
    "lineitem-derived min unit price per (supplier, part); reference runs "
    "Q2 in its devregression corpus). The correlated "
    "``= (SELECT min(...) WHERE c2.l_partkey = p_partkey)`` decorrelates "
    "into one per-part min aggregate joined back on cost equality — the "
    "equality compares UNROUNDED doubles, which are bit-identical across "
    "engines because both compute min over the same IEEE quotients.",
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part
    JOIN cost ON p_partkey = cost.l_partkey
    JOIN eu_supp ON s_suppkey = cost.l_suppkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE '%ANDARD'
      AND unit_cost = (
          SELECT min(c2.unit_cost)
          FROM cost c2
          JOIN eu_supp e2 ON e2.s_suppkey = c2.l_suppkey
          WHERE c2.l_partkey = part.p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per qualifying part within a region.

    Scale shape: lineitem aggregates once on (l_partkey, l_suppkey) —
    the only big shuffle; nation/region are broadcast constants and the
    per-part min is a second tiny aggregate on the already-reduced cost
    table. The correlated subquery never re-probes lineitem.
    """
    from pyspark.sql import Window

    t = Catalog(spark, sf_dir)
    eu_supp = (
        t.supplier.join(
            F.broadcast(
                t.nation.join(
                    t.region.where(F.col("r_name") == "EUROPE"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cost = t.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    eu_cost = cost.join(
        eu_supp, F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("l_partkey")
    best = eu_cost.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).where(F.col("unit_cost") == F.col("min_cost"))
    return (
        t.part.where(
            F.col("p_size").between(10, 20) & F.col("p_type").like("%ANDARD")
        )
        .join(best, F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --- true-shape Q2/Q9/Q20 over a derived partsupp (round-7) ------------------
# The driver fixtures ship no partsupp table, so the reference's exact
# Q2/Q9/Q20 shapes (devregression tpch corpus, mcs7536_q4_2.test family)
# were previously adapted. Here partsupp is DERIVED deterministically:
# its key set is the DISTINCT (l_partkey, l_suppkey) pairs of lineitem
# — the same referential-integrity contract dbgen guarantees (every
# lineitem pair exists in partsupp), which keeps the Q9 double-key join
# total and the Q20 half-volume correlation meaningful — with integer
# availqty / supplycost-cents computed from the keys by fixed mixes.
# BOTH engines (this plan and the DuckDB oracle CTE below) materialize
# the identical relation at any SF with zero extra fixture files. The
# query shapes downstream of partsupp are the reference's own.

#: DuckDB CTE body mirroring _partsupp() — keep the two in lockstep.
PARTSUPP_CTE = """
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 13 + ps_suppkey * 7) % 199 + 1
                    AS BIGINT) AS ps_availqty,
               CAST((ps_partkey * 7919 + ps_suppkey * 104729)
                    % 100000 + 100 AS BIGINT) AS ps_cost_cents
        FROM (
            SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey
            FROM lineitem
        )
    )
"""


def _partsupp(t: Catalog) -> DataFrame:
    """Derived partsupp relation (see PARTSUPP_CTE — keep in
    lockstep). One shuffle: a distinct over lineitem's two key
    columns (column-pruned scan, map-side partial dedup), then pure
    projections — linear at any SF, no constant joins."""
    return (
        t.lineitem.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7)
                % 199
                + 1
            ).cast("long").alias("ps_availqty"),
            (
                (
                    F.col("ps_partkey") * 7919
                    + F.col("ps_suppkey") * 104729
                )
                % 100000
                + 100
            ).cast("long").alias("ps_cost_cents"),
        )
    )


@query(
    "tpch_q2_partsupp",
    section="§2.9 TRUE-SHAPE TPC-H Q2 (r7 — VERDICT r6 #6): the "
    "reference's correlated min-supplycost scalar subquery over "
    "part x partsupp x supplier x nation x region, on the derived "
    "partsupp (PARTSUPP_CTE). The correlated subquery decorrelates "
    "into one per-part window min over the EU-filtered partsupp — "
    "integer-cents cost, so the equality join is exact.",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()},
    eu AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_cost_cents
    FROM part
    JOIN partsupp ON p_partkey = ps_partkey
    JOIN eu ON s_suppkey = ps_suppkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE '%ANDARD'
      AND ps_cost_cents = (
          SELECT min(ps2.ps_cost_cents)
          FROM partsupp ps2
          JOIN eu e2 ON e2.s_suppkey = ps2.ps_suppkey
          WHERE ps2.ps_partkey = part.p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Catalog(spark, sf_dir)
    eu = (
        t.supplier.join(
            F.broadcast(
                t.nation.join(
                    t.region.where(F.col("r_name") == "EUROPE"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_ps = _partsupp(t).join(
        eu, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("ps_partkey")
    best = eu_ps.withColumn(
        "min_cost", F.min("ps_cost_cents").over(w)
    ).where(F.col("ps_cost_cents") == F.col("min_cost"))
    return (
        t.part.where(
            F.col("p_size").between(10, 20)
            & F.col("p_type").like("%ANDARD")
        )
        .join(best, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_cost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_partsupp",
    section="§2.4 TRUE-SHAPE TPC-H Q9 (r7): product profit with the "
    "reference's double-key lineitem->partsupp join on (partkey, "
    "suppkey) and real supply cost, on the derived partsupp. Profit "
    "is summed as exact 1e-4-dollar BIGINTs (rev4 minus "
    "cost-cents x qty x 100) and rendered as the scaled integer — "
    "boundary-free across engines per the decimal output policy.",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()}
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
               - ps_cost_cents
                 * CAST(round(l_quantity, 0) AS BIGINT) * 100
           ) AS BIGINT) AS sum_profit_e4
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN partsupp ON ps_partkey = l_partkey
                 AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    rev4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
    )
    cost4 = (
        F.col("ps_cost_cents")
        * F.round(F.col("l_quantity"), 0).cast("long")
        * 100
    )
    return (
        t.part.where(F.col("p_name").like("%widget%"))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            _partsupp(t),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(rev4 - cost4).cast("long").alias("sum_profit_e4"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q20_partsupp",
    section="§2.9 TRUE-SHAPE TPC-H Q20 (r7): the reference's nested "
    "IN-subquery chain — suppliers (in one nation) whose partsupp "
    "availqty exceeds half the 1996 shipped volume of a "
    "name-filtered part — on the derived partsupp. The correlated "
    "half-volume scalar decorrelates into one (partkey, suppkey) "
    "aggregate joined back; inner join reproduces the NULL-sum "
    "filter semantics.",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()}
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND ps_availqty > (
            SELECT 0.5 * sum(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey
              AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        )
      )
    ORDER BY s_name
    """,
)
def q20_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    small_parts = t.part.where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    ps = _partsupp(t).join(
        F.broadcast(small_parts),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    li_qty = (
        t.lineitem.where(
            (
                F.col("l_shipdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1997-01-01 00:00:00").cast("timestamp")
            )
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1996"))
    )
    excess = (
        ps.join(
            li_qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty_1996"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        t.supplier.join(
            F.broadcast(
                t.nation.where(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            excess,
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
