"""Window-function surface: the full §2.5 matrix.

Reference analogue: WindowFunctionStep partitions/sorts on the UM and
dispatches per-partition functions (dbcon/joblist/windowfunctionstep.h:67,
sort specs windowfunctionstep.cpp:646-676); function ids at
utils/windowfunction/windowfunctiontype.h:62-101 — ROW_NUMBER
(wf_row_number.cpp), RANK family (wf_ranking.cpp), LAG/LEAD
(wf_lead_lag.cpp), NTILE (wf_ntile.cpp), FIRST/LAST/NTH_VALUE
(wf_nth_value.cpp), SUM/AVG/MIN/MAX/COUNT (wf_sum_avg.cpp, wf_min_max.cpp,
wf_count.cpp), STDDEV/VAR (wf_stats.cpp), PERCENTILE_CONT/DISC
(wf_percentile.cpp); ROWS and RANGE frames incl. value offsets
(frameboundrow.cpp, frameboundrange.cpp).

On Spark: ``Window.partitionBy().orderBy()`` with
``rowsBetween``/``rangeBetween``. Every ORDER BY carries a unique key
tiebreak so row-dependent functions (row_number, lag, frames) are
deterministic under ties — the reference has the same requirement
(idborderby.cpp comparator chains).

Scale note: window partitions here are bounded (per-customer, per-status
slices); a window over an unbounded 100 TB partition would need
pre-bucketing, which ``Window.partitionBy`` expresses directly as the
shuffle key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query, sql_query


@query(
    "win_ranking_family",
    section="§2.5 ROW_NUMBER / RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM orders
    WHERE o_totalprice > 480000
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderstatus, rn
    """,
)
def ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        t.orders.where(F.col("o_totalprice") > 480000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderstatus", "rn")
    )


@query(
    "win_lag_lead",
    section="§2.5 LAG / LEAD incl. default values (wf_lead_lag.cpp)",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)           OVER w AS prev_price,
           lead(o_totalprice, 1, 0.0)  OVER w AS next_price,
           lag(o_totalprice, 2)        OVER w AS prev2_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.where(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice", 1, 0.0).over(w).alias("next_price"),
            F.lag("o_totalprice", 2).over(w).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_ntile_first_last_nth",
    section="§2.5 NTILE, FIRST_VALUE / LAST_VALUE / NTH_VALUE w/ full frame",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           ntile(4) OVER w AS quartile,
           first_value(s_name) OVER w AS poorest,
           last_value(s_name) OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal, s_suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS richest,
           nth_value(s_name, 2) OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal, s_suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_poorest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_nationkey, s_acctbal, s_suppkey
    """,
)
def ntile_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.supplier.select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.first("s_name").over(w).alias("poorest"),
            F.last("s_name").over(w_full).alias("richest"),
            F.nth_value("s_name", 2).over(w_full).alias("second_poorest"),
        )
        .orderBy("s_nationkey", "s_acctbal", "s_suppkey")
    )


@query(
    "win_rows_frame_running",
    section="§2.5 ROWS frames: running total + moving average "
    "(frameboundrow.cpp)",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders WHERE o_custkey < 30
    )
    SELECT o_custkey, o_orderkey, o_totalprice,
           round(sum(cents) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 100.0, 2) AS running_total,
           ((2 * sum(cents) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              + count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
             // (2 * count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))) / 100.0
               AS moving_avg3,
           count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS nth_order
    FROM o
    ORDER BY o_custkey, o_orderkey
    """,
)
def rows_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving money aggregates ride exact integer cents.

    The exposed shape (caught by the sf0.1 sweep) is the SHORT moving
    average: a 2- or 3-row mean of 2-dp money lands exactly on a
    half-cent (odd cents over 2 rows), where Spark's BigDecimal HALF_UP
    and DuckDB's multiply-round legitimately disagree — and double
    accumulation drift decides the flip. Cents summation is order-exact
    and the average is rounded to whole cents with half-up INTEGER
    division before the only float op (/100.0), which is bit-identical
    on both engines for the same integer inputs."""
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w.rowsBetween(-2, Window.currentRow)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        t.orders.where(F.col("o_custkey") < 30)
        .withColumn("cents", cents)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round(F.sum("cents").over(w_run) / 100.0, 2).alias(
                "running_total"
            ),
            F.sum("cents").over(w_mov).alias("_mov_sum"),
            F.count(F.lit(1)).over(w_mov).alias("_mov_n"),
            F.count(F.lit(1)).over(w_run).alias("nth_order"),
        )
        # avg rounded to whole cents in INTEGER arithmetic — (2s+n) div
        # (2n) is half-up for positives; a float quotient can sit exactly
        # on a half-cent (odd cents over 2 rows) where the engines'
        # rounding algorithms disagree
        .withColumn(
            "moving_avg3",
            F.expr("(2 * _mov_sum + _mov_n) div (2 * _mov_n)") / 100.0,
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            "running_total",
            "moving_avg3",
            "nth_order",
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "win_range_frame_value_offset",
    section="§2.5 RANGE frame with value offset (frameboundrange.cpp:413)",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
               AS n_within_10k,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING), 2)
               AS sum_within_10k
    FROM orders
    WHERE o_totalprice > 490000
    ORDER BY o_orderstatus, o_totalprice, o_orderkey
    """,
)
def range_frame_value_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return (
        t.orders.where(F.col("o_totalprice") > 490000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.count(F.lit(1))
            .over(w.rangeBetween(-10000, Window.currentRow))
            .alias("n_within_10k"),
            F.round(
                F.sum("o_totalprice").over(w.rangeBetween(-10000, 10000)), 2
            ).alias("sum_within_10k"),
        )
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    )


@query(
    "win_stats_over_partition",
    section="§2.5 STDDEV / VAR as window functions (wf_stats.cpp)",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 2)
               AS std_in_status,
           round(min(o_totalprice) OVER (PARTITION BY o_orderstatus), 2)
               AS min_in_status,
           round(max(o_totalprice) OVER (PARTITION BY o_orderstatus), 2)
               AS max_in_status
    FROM orders
    WHERE o_totalprice > 490000
    ORDER BY o_orderstatus, o_orderkey
    """,
)
def stats_over_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus")
    return (
        t.orders.where(F.col("o_totalprice") > 490000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.stddev_samp("o_totalprice").over(w), 2).alias(
                "std_in_status"
            ),
            F.round(F.min("o_totalprice").over(w), 2).alias("min_in_status"),
            F.round(F.max("o_totalprice").over(w), 2).alias("max_in_status"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
    )


sql_query(
    "win_percentiles_within_group",
    """
    SELECT o_orderstatus,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p50,
           round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p90,
           round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p50_disc
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    section="§2.5 PERCENTILE_CONT / PERCENTILE_DISC WITHIN GROUP "
    "(wf_percentile.cpp:388)",
)


@query(
    "win_topn_per_group",
    section="§2.5 row_number top-n-per-group (the reference regression "
    "corpus's most common window idiom)",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) ranked
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    return (
        t.customer.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "win_distinct_agg_over_partition",
    section="§2.5 DISTINCT window aggregates (windowfunctiontype.h DISTINCT "
    "variants) — Spark expresses them as size(collect_set()) over w",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           count(DISTINCT o_orderpriority)
               OVER (PARTITION BY o_orderstatus) AS n_prios_in_status
    FROM orders
    WHERE o_totalprice > 490000
    ORDER BY o_orderstatus, o_orderkey
    """,
)
def distinct_agg_over_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus")
    return (
        t.orders.where(F.col("o_totalprice") > 490000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.size(F.collect_set("o_orderpriority").over(w)).cast("long")
            .alias("n_prios_in_status"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
    )


@query(
    "win_regr_over_partition",
    section="§2.5 REGR_* family as window functions "
    "(windowfunctiontype.h:92-100, utils/regr/)",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(regr_slope(l_extendedprice, l_quantity)
                 OVER (PARTITION BY l_returnflag), 4) AS slope_in_flag,
           round(corr(l_extendedprice, l_quantity)
                 OVER (PARTITION BY l_returnflag), 6) AS corr_in_flag
    FROM lineitem
    WHERE l_orderkey < 50
    ORDER BY l_orderkey, l_linenumber
    """,
)
def regr_over_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("l_returnflag")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        t.lineitem.where(F.col("l_orderkey") < 50)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.regr_slope(y, x).over(w), 4).alias("slope_in_flag"),
            F.round(F.corr(y, x).over(w), 6).alias("corr_in_flag"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "win_pandas_udaf_over_window",
    section="§2.5/§2.11 UDAF-as-window-function (wf_udaf.cpp) — pandas "
    "GROUPED_AGG UDF over an unbounded partition frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(median(o_totalprice)
                 OVER (PARTITION BY o_orderstatus), 4) AS median_in_status
    FROM orders
    WHERE o_totalprice > 490000
    ORDER BY o_orderkey
    """,
)
def pandas_udaf_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.functions.udf import median_udaf

    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus")
    return (
        t.orders.where(F.col("o_totalprice") > 490000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(median_udaf("o_totalprice").over(w), 4).alias(
                "median_in_status"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "win_range_interval_event_time",
    section="§2.5 RANGE frame with INTERVAL value offsets over event "
    "time (frameboundrange.cpp value-offset frames applied to a "
    "temporal order key) — a per-user rolling 1-hour window, the frame "
    "spelling the reference's RANGE bounds support for datetime "
    "columns; peers (equal ts) share the frame by value in both "
    "engines",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_events_1h,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                AS BIGINT) AS cents_1h
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def range_interval_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user aggregates via a RANGE INTERVAL frame —
    the frame boundary is event-time VALUE distance, not row counts, so
    sparse and bursty users both get exactly one hour of context. One
    shuffle on user_id; frame state is bounded by events-per-hour."""
    t = Catalog(spark, sf_dir)
    frame = (
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    )
    return (
        t.events.where(F.col("user_id") < 40)
        .select(
            "event_id",
            "user_id",
            F.expr(f"count(*) OVER ({frame})").cast("long").alias(
                "n_events_1h"
            ),
            F.expr(
                f"sum(cast(round(value * 100, 0) as bigint)) OVER ({frame})"
            ).cast("long").alias("cents_1h"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_bit_ops_over_partition",
    section="§2.5 BIT_AND / BIT_OR / BIT_XOR as window functions "
    "(mysql-test/columnstore/basic/t/window_function_bit_{and,or,xor}"
    ".test; aggregate ids utils/rowgroup/rowaggregation.h:65-119 applied "
    "over WindowFunctionStep partitions)",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(bit_and(o_orderkey % 256) OVER w AS BIGINT) AS band,
           CAST(bit_or(o_orderkey % 256) OVER w AS BIGINT) AS bor,
           CAST(bit_xor(o_orderkey % 256) OVER w AS BIGINT) AS bxor,
           CAST(bit_and(o_orderkey % 256) OVER running AS BIGINT)
               AS band_running
    FROM orders
    WHERE o_orderkey < 600
    WINDOW w AS (PARTITION BY o_custkey),
           running AS (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def bit_ops_over_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    k = F.col("o_orderkey") % 256
    w = Window.partitionBy("o_custkey")
    running = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.orders.where(F.col("o_orderkey") < 600)
        .select(
            "o_orderkey",
            "o_custkey",
            F.bit_and(k).over(w).cast("long").alias("band"),
            F.bit_or(k).over(w).cast("long").alias("bor"),
            F.bit_xor(k).over(w).cast("long").alias("bxor"),
            F.bit_and(k).over(running).cast("long").alias("band_running"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "win_moda_analytic",
    section="§2.5 MODA as analytic function (utils/regr/moda.h:25-26 "
    "registers moda as UDAnF too) — the scale-correct unbounded-frame "
    "spelling: per-partition MODA computed ONCE by the grouped operator "
    "(operators/moda.py) and broadcast-joined back to the rows, instead "
    "of shipping every partition's rows to a per-row window UDAF",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), c AS (
        SELECT event_type, cents AS v, count(*) AS n
        FROM e GROUP BY event_type, cents
    ), a AS (
        SELECT event_type, sum(v * n) / sum(n) AS avgv
        FROM c GROUP BY event_type
    ), r AS (
        SELECT c.event_type, v,
               row_number() OVER (PARTITION BY c.event_type
                   ORDER BY n DESC, abs(v - avgv), v) AS rn
        FROM c JOIN a ON c.event_type = a.event_type
    )
    SELECT e.event_id, e.event_type, e.cents,
           r.v AS type_moda
    FROM e JOIN r ON e.event_type = r.event_type AND r.rn = 1
    WHERE e.event_id < 100
    ORDER BY e.event_id
    """,
)
def moda_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.operators.moda import moda

    t = Catalog(spark, sf_dir)
    e = t.events.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    per_type = moda(e, "cents", ("event_type",), "type_moda")
    return (
        e.where(F.col("event_id") < 100)
        .join(F.broadcast(per_type), "event_type")
        .select("event_id", "event_type", "cents", "type_moda")
        .orderBy("event_id")
    )


@query(
    "win_corr_running_null_semantics",
    section="§2.5 CORR over running frames with MariaDB NULL "
    "semantics (r7 — mcs6178_windowFunctions_CORR.test): Spark's "
    "native corr THROWS under ANSI mode on zero-variance frames "
    "(1-row leading frames, tied x runs); the dialect rewrites CORR "
    "to a try_divide moment formula — NULL there, equal to native "
    "corr elsewhere. Small-magnitude inputs (mod-reduced keys) keep "
    "the moment sums exact in doubles so both engines round "
    "identically; DuckDB's corr window natively yields the same "
    "NULLs.",
    oracle="""
    SELECT o_orderkey,
           round(corr(o_custkey % 7, o_orderkey % 89) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS c
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
)
def win_corr_running_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql(
        "SELECT o_orderkey,"
        " ROUND(CORR(o_custkey % 7, o_orderkey % 89) OVER ("
        "   PARTITION BY o_orderpriority ORDER BY o_orderkey"
        "   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS c"
        " FROM orders"
        " WHERE o_orderkey < 300"
        " ORDER BY o_orderkey"
    )


@query(
    "win_suffix_frame_stats",
    section="§2.5 suffix ROWS frames ([k PRECEDING|CURRENT ROW] .. "
    "UNBOUNDED FOLLOWING; frameboundrow.cpp) — driver evidence for "
    "the r9 O(n) lowering: the suffix frame mirrors onto the "
    "reversed-order running frame (Spark's add-only "
    "UnboundedPreceding processor), evaluating the NATIVE aggregate "
    "over exactly the original frame rows — r9 replaced the r8 "
    "raw-moment/3-term forms whose subtraction noise lost digits on "
    "large-magnitude operands. The independent variable is shifted "
    "to epoch-second magnitude to pin exactly that regime; DuckDB "
    "evaluates the same frames natively.",
    oracle="""
    SELECT o_orderkey AS ok,
           ROUND(SUM(o_totalprice) OVER sfx, 2) AS sfx_sum,
           COUNT(o_totalprice) OVER sfx AS sfx_cnt,
           ROUND(REGR_SLOPE(o_totalprice,
                            CAST(o_orderkey + 1700000000 AS DOUBLE))
                 OVER sfx, 4) AS sfx_slope,
           ROUND(REGR_R2(o_totalprice,
                         CAST(o_orderkey + 1700000000 AS DOUBLE))
                 OVER sfx, 4) AS sfx_r2,
           ROUND(STDDEV_POP(o_totalprice) OVER sfx, 2) AS sfx_std
    FROM orders
    WHERE o_custkey <= 300
    WINDOW sfx AS (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY ok
    """,
)
def win_suffix_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MariaDB text with inline suffix-frame OVERs (the lowering
    parses inline specs; named WINDOWs stay on the native O(n^2)
    path). STDDEV here is MariaDB's bare spelling — population — so
    this row also carries the r9 *_POP alias mapping."""
    from mariadb_columnstore_engine_spark.functions.sqltrans import (
        translate_statement,
    )

    sfx = (
        "PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN 3 PRECEDING AND UNBOUNDED FOLLOWING"
    )
    stmt = f"""
    SELECT o_orderkey AS ok,
           ROUND(SUM(o_totalprice) OVER ({sfx}), 2) AS sfx_sum,
           COUNT(o_totalprice) OVER ({sfx}) AS sfx_cnt,
           ROUND(REGR_SLOPE(o_totalprice, o_orderkey + 1700000000)
                 OVER ({sfx}), 4) AS sfx_slope,
           ROUND(REGR_R2(o_totalprice, o_orderkey + 1700000000)
                 OVER ({sfx}), 4) AS sfx_r2,
           ROUND(STDDEV(o_totalprice) OVER ({sfx}), 2) AS sfx_std
    FROM orders
    WHERE o_custkey <= 300
    ORDER BY ok;
    """
    # registration from the statement text (not a bare table name) so
    # the view list can never silently diverge from the tables the
    # statement references (ADVICE r12)
    Catalog(spark, sf_dir).register_views_for(stmt)
    return spark.sql(translate_statement(stmt))


@query(
    "win_nth_value_suffix",
    section="§2.5 NTH_VALUE over suffix ROWS frames (reference "
    "utils/windowfunction/wf_nth_value.cpp:273) — r10 O(n) lowering: "
    "the frame start is the fixed position max(0, i-k), so the read "
    "splits into constant-offset LEAD/LAG past the clamp point and a "
    "whole-partition NTH_VALUE (one evaluation per partition) before "
    "it, replacing the last O(n^2) per-row frame processor. DuckDB "
    "evaluates the same suffix frames natively as the oracle.",
    oracle="""
    SELECT o_orderkey AS ok,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
               2) AS nth2_cur,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 5 PRECEDING AND UNBOUNDED FOLLOWING),
               2) AS nth3_k5,
           ROUND(NTH_VALUE(o_totalprice, 7) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING),
               2) AS nth7_k2
    FROM orders
    WHERE o_custkey <= 300
    ORDER BY ok
    """,
)
def win_nth_value_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MariaDB statement goes through translate_statement so the
    suffix NTH_VALUE lowering (sqltrans._rewrite_suffix_frames) is the
    surface under test: n <= k (LAG), n > k (LEAD), and the clamped
    head rows (whole-partition read). ORDER BY o_orderkey is unique
    per partition — no tie indeterminacy."""
    from mariadb_columnstore_engine_spark.functions.sqltrans import (
        translate_statement,
    )

    stmt = """
    SELECT o_orderkey AS ok,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
               2) AS nth2_cur,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 5 PRECEDING AND UNBOUNDED FOLLOWING),
               2) AS nth3_k5,
           ROUND(NTH_VALUE(o_totalprice, 7) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING),
               2) AS nth7_k2
    FROM orders
    WHERE o_custkey <= 300
    ORDER BY ok;
    """
    Catalog(spark, sf_dir).register_views_for(stmt)
    return spark.sql(translate_statement(stmt))


@query(
    "win_window_lowering_bench",
    section="§2.5 BENCH anchor for the window-lowering path (VERDICT "
    "r10 #5): the r9 suffix-frame mirror (SUM/COUNT/STDDEV/REGR_SLOPE "
    "over [k PRECEDING .. UNBOUNDED FOLLOWING]; frameboundrow.cpp, "
    "wf_stats.cpp) AND the r10 NTH_VALUE suffix split "
    "(wf_nth_value.cpp:273), spelled through a named WINDOW clause "
    "(the r10 expansion), over FULL orders partitioned by "
    "o_orderpriority — n/5-row partitions (30k at bench SF), so a "
    "regression to the native O(n^2) per-row frame processor shows "
    "up in BENCH wall-clock, not just in correctness.",
    bench=True,
    cache_plan=True,  # pure plan builder (VERDICT r12 #7)
    # one output row per input row (150k at bench SF) — noop sink
    # (guide §1.4; declared r12 methodology fix, registry.QuerySpec.sink)
    sink="noop",
    oracle="""
    SELECT o_orderkey AS ok,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER sfx
                AS DOUBLE) AS sfx_sum,
           COUNT(o_totalprice) OVER sfx AS sfx_cnt,
           ROUND(MIN(o_totalprice) OVER sfx, 2) AS sfx_min,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER sfx, 2) AS nth3
    FROM orders
    WINDOW sfx AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY ok
    """,
)
def win_window_lowering_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MariaDB text through translate_statement: the named-WINDOW
    expansion inlines ``sfx`` into every OVER (Spark has no WINDOW
    clause), then the suffix lowerings fire per function.

    Output columns are deliberately EXACT-valued only — decimal SUM
    (both engines accumulate exactly), COUNT, MIN and NTH_VALUE
    (exact picks) — because over n/5-row partitions ANY float-rounded
    accumulator (STDDEV/REGR) straddles rounding grids at the frame
    tails (measured in r11: REGR_SLOPE 4th-decimal diffs where the
    tail frame is 5-20 rows but the mirror has accumulated 3k rows);
    the noisy-stat suffix lowerings keep their own oracle rows
    (win_suffix_frame_stats) at exactness-preserving partition sizes.
    o_orderkey is globally unique so output order is deterministic."""
    from mariadb_columnstore_engine_spark.functions.sqltrans import (
        translate_statement,
    )

    # /*+ REPARTITION */ materializes an exchange boundary between the
    # window passes and the global ORDER BY (r13, guide §2.4/§7.2):
    # the range exchange's boundary sampling otherwise RE-EXECUTES its
    # whole un-materialized child — both window passes — once for the
    # sample and once for the shuffle write (measured sf1: final sort
    # step 1.76 s of the 3.3 s query; with the boundary the sampler
    # re-reads the round-robin shuffle instead: 3.2-3.3 → 2.3 s sf1,
    # 1.1-1.4 → 0.74 s sf0.1, rows identical). This is the reference's
    # own structure — WindowFunctionStep materializes its RowGroup
    # output before the idborderby sort step consumes it. MariaDB
    # parses /*+ */ optimizer-hint comments, so the statement stays
    # front-end-valid; the DuckDB oracle text is unchanged.
    stmt = """
    SELECT /*+ REPARTITION */ o_orderkey AS ok,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER sfx
                AS DOUBLE) AS sfx_sum,
           COUNT(o_totalprice) OVER sfx AS sfx_cnt,
           ROUND(MIN(o_totalprice) OVER sfx, 2) AS sfx_min,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER sfx, 2) AS nth3
    FROM orders
    WINDOW sfx AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY ok;
    """
    cat = Catalog(spark, sf_dir)
    cat.register_views_for(stmt)
    # catalog schema → direct loose-cast parse for the DECIMAL(18,2)
    # projection (sqltrans r12 fast path; the server's parser has the
    # same catalog at hand)
    return spark.sql(
        translate_statement(
            stmt, numeric_columns=cat.numeric_columns(("orders",))
        )
    )
