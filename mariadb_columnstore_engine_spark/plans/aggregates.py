"""Aggregation surface: the full §2.4 function set.

Reference analogue: RowAggregation function enum
(utils/rowgroup/rowaggregation.h:65-119): COUNT(*)/COUNT, SUM, AVG, MIN,
MAX, STDDEV_POP/SAMP, VAR_POP/SAMP, BIT_AND/OR/XOR, GROUP_CONCAT
(dbcon/joblist/groupconcat.h:44), JSON_ARRAYAGG (jsonarrayagg.h:51),
DISTINCT variants incl. several distinct aggs in one query
(rowaggregation.h:879-979 RowAggregationDistinct/MultiDistinct), plus the
regression aggregates (utils/regr/). ROLLUP/CUBE/GROUPING SETS are a free
upgrade over the reference (absent from CSEP,
calpontselectexecutionplan.h:236-244).

Catalyst runs all of these as partial+final hash aggregation — the same
2-phase PM→UM split as prep2PhasesAggregate (tupleaggregatestep.cpp:887);
DISTINCT aggs become expand + two-stage plans.

Float policy: variance outputs are reported in millions (var/1e6) before
2-dp rounding — raw variances of ~1e10 would let 1e-12-relative
cross-engine summation drift flip the rounding boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.functions import dialect
from mariadb_columnstore_engine_spark.plans.registry import query, sql_query


@query(
    "agg_min_max",
    section="§2.4 MIN/MAX over numeric, string and timestamp types",
    oracle="""
    SELECT l_returnflag,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
           min(l_linestatus) AS min_status, max(l_linestatus) AS max_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.min("l_linestatus").alias("min_status"),
            F.max("l_linestatus").alias("max_status"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stddev_variance",
    section="§2.4 STDDEV_POP/SAMP, VAR_POP/SAMP (wf_stats analogue in agg)",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_samp(o_totalprice), 2) AS std_samp,
           round(stddev_pop(o_totalprice), 2)  AS std_pop,
           round(var_samp(o_totalprice) / 1000000, 2) AS var_samp_m,
           round(var_pop(o_totalprice) / 1000000, 2)  AS var_pop_m
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 2).alias("std_samp"),
            F.round(F.stddev_pop("o_totalprice"), 2).alias("std_pop"),
            F.round(F.var_samp("o_totalprice") / 1e6, 2).alias("var_samp_m"),
            F.round(F.var_pop("o_totalprice") / 1e6, 2).alias("var_pop_m"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_multi_distinct",
    section="§2.4 several DISTINCT aggs in one query "
    "(rowaggregation.h:979 RowAggregationMultiDistinct)",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)   AS n_parts,
           count(DISTINCT l_suppkey)   AS n_supps,
           CAST(sum(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_line,
           round(avg(DISTINCT l_quantity), 6) AS avg_distinct_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # l_linenumber / l_quantity are small integer-valued domains: DISTINCT
    # sums are exact, so no float-drift risk despite double storage type.
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.sum_distinct(F.col("l_linenumber")).alias("sum_distinct_line"),
            F.round(F.expr("avg(DISTINCT l_quantity)"), 6).alias(
                "avg_distinct_qty"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_bit_ops",
    section="§2.4 BIT_AND / BIT_OR / BIT_XOR (rowaggregation.h bit aggs)",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS ba,
           bit_or(l_linenumber)  AS bo,
           bit_xor(l_linenumber) AS bx
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("ba"),
            F.bit_or("l_linenumber").alias("bo"),
            F.bit_xor("l_linenumber").alias("bx"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_group_concat_ordered",
    section="§2.4 GROUP_CONCAT w/ ORDER BY + SEPARATOR "
    "(dbcon/joblist/groupconcat.h:44; exercises functions/dialect.py)",
    oracle="""
    SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("r_name")
        .agg(dialect.group_concat("n_name", "|", order_by="n_name").alias("nations"))
        .orderBy("r_name")
    )


@query(
    "agg_json_arrayagg",
    section="§2.4 JSON_ARRAYAGG (dbcon/joblist/jsonarrayagg.h:51; "
    "exercises functions/dialect.py)",
    oracle="""
    SELECT r_name, to_json(list(n_name ORDER BY n_name)) AS nations_json
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def json_arrayagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("r_name")
        .agg(dialect.json_arrayagg("n_name").alias("nations_json"))
        .orderBy("r_name")
    )


@query(
    "agg_rollup",
    section="§2.4 ROLLUP (free upgrade over reference; absent from CSEP)",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n"
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    section="§2.4 CUBE (free upgrade over reference)",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


sql_query(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, c_nationkey, count(*) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
    section="§2.4 GROUPING SETS (free upgrade over reference)",
)


@query(
    "agg_count_variants",
    section="§2.4 COUNT(*) vs COUNT(col) null-skip vs conditional SUM",
    oracle="""
    SELECT count(*) AS n_all,
           count(nullif(o_orderstatus, 'P')) AS n_not_p,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_p
    FROM orders
    """,
)
def count_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.orders.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("P"))).alias("n_not_p"),
        F.sum(
            F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)
        ).alias("n_p"),
    )


@query(
    "agg_having_top_groups",
    section="§2.4 HAVING (TupleHavingStep) + §2.6 top-k",
    oracle="""
    SELECT l_partkey, count(*) AS n_items
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 45
    ORDER BY n_items DESC, l_partkey
    LIMIT 15
    """,
)
def having_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .where(F.col("n_items") >= 45)
        .orderBy(F.desc("n_items"), "l_partkey")
        .limit(15)
    )


@query(
    "agg_regr_family",
    section="§2.4 regression aggregates (utils/regr/: REGR_* , CORR, COVAR)",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6)       AS r,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           regr_count(l_extendedprice, l_quantity)           AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 4)  AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 2)  AS avgy,
           round(covar_samp(l_extendedprice, l_quantity) / 1000, 2) AS covar_k
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def regr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(y, x), 6).alias("r"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 4).alias("avgx"),
            F.round(F.regr_avgy(y, x), 2).alias("avgy"),
            F.round(F.covar_samp(y, x) / 1e3, 2).alias("covar_k"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_count_distinct",
    section="§2.4 approx-distinct (bonus over reference — exact-only there). "
    "HLL sketches differ per engine, so the hash-comparable contract is a "
    "bounded-relative-error boolean: |approx − exact| / exact ≤ 5% (Spark's "
    "default rsd is 0.05); the oracle computes exact counts and TRUE.",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    approx = F.approx_count_distinct("l_partkey")
    exact = F.count_distinct("l_partkey")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                / exact.cast("double")
                <= F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_group_concat_distinct",
    section="§2.4 GROUP_CONCAT(DISTINCT ... ORDER BY) "
    "(groupconcat.h DISTINCT path; exercises dialect.group_concat)",
    oracle="""
    SELECT n_regionkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def group_concat_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_regionkey")
        .agg(
            dialect.group_concat("c_mktsegment", ",", distinct=True).alias(
                "segments"
            )
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_approx_percentile",
    section="§2.4 approx-percentile (bonus, pairs with "
    "agg_approx_count_distinct): sketch values differ per engine, so the "
    "hash-comparable contract is exact percentile + a bounded-relative-"
    "error boolean |approx − exact| / exact ≤ 5%",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
           TRUE AS approx_within_5pct
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    exact = F.expr("percentile(o_totalprice, 0.5)")
    approx = F.percentile_approx("o_totalprice", 0.5, 10000)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.round(exact, 4).alias("exact_p50"),
            (F.abs(approx - exact) / exact <= F.lit(0.05)).alias(
                "approx_within_5pct"
            ),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_group_concat_limit",
    section="§2.4 GROUP_CONCAT ... LIMIT (groupconcat.cpp; MariaDB 10.6 "
    "extension) — first n of the ordered list per group",
    oracle="""
    SELECT n_regionkey,
           array_to_string(
               list_slice(list(n_name ORDER BY n_name), 1, 3), '|')
               AS top3_names
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def group_concat_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.nation.groupBy("n_regionkey")
        .agg(
            dialect.group_concat(
                "n_name", "|", order_by="n_name", limit=3
            ).alias("top3_names")
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_hll_sketch_mergeable_rollup",
    section="§2.4 MERGEABLE distinct-count sketches (bonus over the "
    "reference's exact-only aggregation, rowaggregation.h:65-119): "
    "Datasketches HLL via hll_sketch_agg per fine group → hll_union_agg "
    "re-aggregated to the coarse group. This is the 100 TB rollup "
    "pattern — persist per-partition sketches once, answer any coarser "
    "distinct-count by UNIONING sketches without rescanning raw data. "
    "Sketch bytes differ per engine, so the hash-comparable contract is "
    "exact counts + bounded-relative-error booleans: union estimate "
    "within 5% of exact, and within 2% of re-sketching the coarse group "
    "directly (union re-targets the HLL representation, so bit-equality "
    "does not hold — measured drift here is ~0.4%).",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS union_within_5pct,
           TRUE AS union_consistent
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def hll_sketch_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # fine level: one sketch per (returnflag, linestatus) — at scale this
    # materializes into a rollup table, ~KB per group
    fine = t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    # coarse level: union the fine sketches (NO raw-data rescan)
    unioned = fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est")
    )
    direct = t.lineitem.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias(
            "direct_est"
        ),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    j = unioned.join(direct, "l_returnflag")
    return j.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("union_est").cast("double")
                  - F.col("exact_parts").cast("double"))
            / F.col("exact_parts").cast("double")
            <= F.lit(0.05)
        ).alias("union_within_5pct"),
        # merging fine sketches must track the direct coarse sketch
        # (union re-targets representation → small drift, not equality)
        (
            F.abs(F.col("union_est").cast("double")
                  - F.col("direct_est").cast("double"))
            / F.col("exact_parts").cast("double")
            <= F.lit(0.02)
        ).alias("union_consistent"),
    ).orderBy("l_returnflag")


@query(
    "agg_count_distinct_multiparam",
    section="§2.4 multi-parameter COUNT(DISTINCT a, b, c) "
    "(mcol3738_count_distinct_multiparm.test; rowaggregation.h "
    "multi-param marker) — the distinct key is the column TUPLE, "
    "NULL-bearing tuples excluded per SQL COUNT semantics",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT (l_returnflag, l_linestatus, l_linenumber))
                AS BIGINT) AS nd_tuple,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_single
    FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def count_distinct_multiparam(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    joined = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count_distinct(
                "l_returnflag", "l_linestatus", "l_linenumber"
            ).alias("nd_tuple"),
            F.count_distinct("o_custkey").alias("nd_single"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_moda",
    section="§2.4 MODA — ColumnStore's statistical-mode UDAF "
    "(utils/regr/moda.h:24-35, mcs98_moda_function.test): most frequent "
    "value per group; ties broken by closest-to-AVG then smallest. "
    "Spark-first as counts → weighted mean → max_by struct (operators/"
    "moda.py) — no UDF, two aggregated-data shuffles",
    oracle="""
    WITH c1 AS (
        SELECT l_returnflag, l_quantity AS v, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ), a1 AS (
        SELECT l_returnflag, sum(v * n) / sum(n) AS avgv
        FROM c1 GROUP BY l_returnflag
    ), r1 AS (
        SELECT c1.l_returnflag, v,
               row_number() OVER (
                   PARTITION BY c1.l_returnflag
                   ORDER BY n DESC, abs(v - avgv), v
               ) AS rn
        FROM c1 JOIN a1 ON c1.l_returnflag = a1.l_returnflag
    ), c2 AS (
        SELECT l_returnflag, l_linenumber AS v, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linenumber
    ), a2 AS (
        SELECT l_returnflag, sum(v * n) / sum(n) AS avgv
        FROM c2 GROUP BY l_returnflag
    ), r2 AS (
        SELECT c2.l_returnflag, v,
               row_number() OVER (
                   PARTITION BY c2.l_returnflag
                   ORDER BY n DESC, abs(v - avgv), v
               ) AS rn
        FROM c2 JOIN a2 ON c2.l_returnflag = a2.l_returnflag
    )
    SELECT r1.l_returnflag,
           CAST(r1.v AS BIGINT) AS moda_qty,
           CAST(r2.v AS BIGINT) AS moda_line
    FROM r1 JOIN r2 ON r1.l_returnflag = r2.l_returnflag
    WHERE r1.rn = 1 AND r2.rn = 1
    ORDER BY r1.l_returnflag
    """,
)
def agg_moda(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.operators.moda import moda

    t = Catalog(spark, sf_dir)
    m_qty = moda(t.lineitem, "l_quantity", ("l_returnflag",), "moda_qty")
    m_line = moda(t.lineitem, "l_linenumber", ("l_returnflag",), "moda_line")
    return (
        m_qty.join(m_line, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("moda_qty").cast("long").alias("moda_qty"),
            F.col("moda_line").cast("long").alias("moda_line"),
        )
        .orderBy("l_returnflag")
    )
