"""Predicate/filter surface: LIKE, IN, NULL semantics, column-vs-column,
compound boolean trees, metadata pseudo-columns.

Reference analogue: ColumnCommand applies vectorized compare filters with
op codes COMPARE_EQ/NE/LT/GT/LE/GE/LIKE/NLIKE and BOP AND/OR combination
(primitives/primproc/columncommand.h:43, dbcon/joblist/primitivemsg.h:
56-57); string LIKE predicates run as pDictionaryScan over dictionary
blocks (primitivestep.h:671); column-vs-column comparison is
FilterCommand (primitives/primproc/filtercommand.h:37); pseudo-columns
idbdbroot/idbpm/idbextentid map to Spark's metadata functions
(dbcon/mysql/ha_pseudocolumn.cpp:33-44).

Every filter here lands in the parquet scan as a pushed predicate where
the type allows (`.explain` → PushedFilters); the fixtures carry no NULLs,
so null-semantics probes inject them via ``nullif`` identically in both
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query


@query(
    "filter_like_patterns",
    section="§2.2 LIKE / NOT LIKE ≈ pDictionaryScan (primitivestep.h:671)",
    oracle="""
    SELECT count(CASE WHEN p_type LIKE 'S%' THEN 1 END)      AS n_prefix,
           count(CASE WHEN p_name LIKE '%idge%' THEN 1 END)  AS n_infix,
           count(CASE WHEN p_name LIKE '%t' THEN 1 END)      AS n_suffix,
           count(CASE WHEN p_brand LIKE 'Brand#_3' THEN 1 END) AS n_underscore,
           count(CASE WHEN p_type NOT LIKE 'PROMO%' THEN 1 END) AS n_not_like
    FROM part
    """,
)
def like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)

    def cnt(cond):
        return F.count(F.when(cond, 1))

    return t.part.agg(
        cnt(F.col("p_type").like("S%")).alias("n_prefix"),
        cnt(F.col("p_name").like("%idge%")).alias("n_infix"),
        cnt(F.col("p_name").like("%t")).alias("n_suffix"),
        cnt(F.col("p_brand").like("Brand#_3")).alias("n_underscore"),
        cnt(~F.col("p_type").like("PROMO%")).alias("n_not_like"),
    )


@query(
    "filter_in_null_semantics",
    section="§2.2 IN list, IS [NOT] NULL, null-safe equality "
    "(NULL-aware compare ops, joblisttypes.h:60-86 null magics)",
    oracle="""
    WITH probed AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_or_null,
               o_orderpriority
        FROM orders
    )
    SELECT count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS n_in,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS n_not_in,
           count(CASE WHEN status_or_null IS NULL THEN 1 END) AS n_null,
           count(CASE WHEN status_or_null IS NOT NULL THEN 1 END) AS n_not_null,
           count(CASE WHEN status_or_null IS NOT DISTINCT FROM NULL
                      THEN 1 END) AS n_null_safe_eq
    FROM probed
    """,
)
def in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    probed = t.orders.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_or_null"),
        "o_orderpriority",
    )

    def cnt(cond):
        return F.count(F.when(cond, 1))

    prio = F.col("o_orderpriority")
    sn = F.col("status_or_null")
    return probed.agg(
        cnt(prio.isin("1-URGENT", "2-HIGH")).alias("n_in"),
        cnt(~prio.isin("1-URGENT", "2-HIGH")).alias("n_not_in"),
        cnt(sn.isNull()).alias("n_null"),
        cnt(sn.isNotNull()).alias("n_not_null"),
        cnt(sn.eqNullSafe(F.lit(None))).alias("n_null_safe_eq"),
    )


@query(
    "filter_col_vs_col",
    section="§2.2 column-vs-column filter = FilterCommand "
    "(primitives/primproc/filtercommand.h:37)",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_discount > l_tax
      AND l_extendedprice > 1000 * (l_quantity + 1)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def col_vs_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_discount") > F.col("l_tax"))
            & (F.col("l_extendedprice") > 1000 * (F.col("l_quantity") + 1))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "filter_compound_boolean_tree",
    section="§2.2 BOP AND/OR predicate trees (TPC-H Q19 shape; "
    "jlf_execplantojoblist.cpp:1477 doSimpleFilter chains)",
    oracle="""
    SELECT count(*) AS n, round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 15 AND 35)
       OR (p_type LIKE 'ECONOMY%' AND l_quantity >= 40)
    """,
)
def compound_boolean_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(15, 35)
        )
        | (F.col("p_type").like("ECONOMY%") & (F.col("l_quantity") >= 40))
    )
    return (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "filter_metadata_pseudocols",
    section="§2.1 PseudoColStep → metadata pseudo-columns "
    "(ha_pseudocolumn.cpp:33-44: idbdbroot/idbpm/idbsegment/"
    "idbextentid). Three Spark analogues in one row: input_file_name() "
    "and _metadata.file_path (≈ which extent/segment file a row lives "
    "in) and spark_partition_id() (≈ which PM/dbroot is scanning it).",
    oracle="""
    -- Layout-AGNOSTIC invariants (round-5 finding: the old oracle
    -- hard-coded the basename 'region.parquet' and one scan partition,
    -- so any multi-file fixture layout failed it). The Spark side
    -- derives each boolean from the real pseudo-columns plus a disk
    -- listing of sf_dir; the oracle pins what must ALWAYS hold:
    -- every distinct source file on disk is reported, both file-path
    -- pseudo-columns agree row-by-row, every path lives under sf_dir,
    -- at least one scan partition ran, and the row count matches.
    -- (The exact-basename assertion lives in a pytest that writes its
    -- own single-file fixture — tests/test_plan_shapes.py.)
    SELECT true AS files_match_disk,
           true AS meta_matches_input,
           true AS paths_under_sfdir,
           true AS partitions_positive,
           count(*) AS n
    FROM region
    """,
)
def metadata_pseudocols(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os

    t = Catalog(spark, sf_dir)
    rpath = os.path.join(sf_dir, "region.parquet")
    if os.path.isdir(rpath):
        n_files = len(
            [
                f
                for f in glob.glob(
                    os.path.join(rpath, "**", "*.parquet"), recursive=True
                )
                if os.path.isfile(f)
            ]
        )
    else:
        n_files = 1
    sf_prefix = os.path.abspath(sf_dir)
    base = F.regexp_extract(F.input_file_name(), "[^/]+$", 0)
    # _metadata struct needs a fresh scan-relation select (it is a
    # hidden source column, resolvable only against the file source)
    meta_base = F.regexp_extract(
        F.col("_metadata.file_path"), "[^/]+$", 0
    )
    meta_path = F.regexp_replace(
        F.col("_metadata.file_path"), "^file:/*", "/"
    )
    return t.region.select(
        base.alias("_fname"),
        meta_base.alias("_mname"),
        meta_path.alias("_mpath"),
        F.spark_partition_id().alias("_pid"),
    ).agg(
        (F.countDistinct("_fname") == F.lit(n_files)).alias(
            "files_match_disk"
        ),
        F.min(F.col("_fname") == F.col("_mname")).alias(
            "meta_matches_input"
        ),
        F.min(
            F.col("_mpath").startswith(sf_prefix)
            | F.col("_mpath").startswith(os.path.realpath(sf_dir))
        ).alias("paths_under_sfdir"),
        (F.countDistinct("_pid") >= 1).alias("partitions_positive"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "filter_constant_select_literals",
    section="§2.2 TupleConstantOnlyStep: SELECT <literals> with no table "
    "(tupleconstantstep.h:112)",
    oracle="""
    SELECT 42 AS answer, 'engine' AS tag,
           CAST(round(3.14159, 2) AS DOUBLE) AS pi2,
           CAST(NULL AS INTEGER) AS nothing
    """,
)
def constant_select_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit(42).alias("answer"),
        F.lit("engine").alias("tag"),
        F.round(F.lit(3.14159), 2).alias("pi2"),
        F.lit(None).cast("int").alias("nothing"),
    )


@query(
    "filter_constant_false",
    section="§2.2 TupleConstantBooleanStep: WHERE 1=0 constant-false scan "
    "elision (tupleconstantstep.h:139)",
    oracle="SELECT r_regionkey, r_name FROM region WHERE 1 = 0",
)
def constant_false(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.region.where(F.lit(1) == 0).select("r_regionkey", "r_name")


@query(
    "filter_extent_minmax_pseudocols",
    section="§2.1 PseudoColStep: idbExtentMin/idbExtentMax/idbExtentId "
    "(ha_pseudocolumn.cpp:39-41; mcs211-213 MTR tests) — the BRM extent "
    "map's casual-partitioning min/max surfaced as a relation, read from "
    "parquet footers with NO data scan (sources/maintenance.extent_map).",
    oracle="""
    -- Layout-agnostic invariant: whatever the file/row-group layout,
    -- the extent map's envelope (min of mins, max of maxes, sum of
    -- per-extent row counts) must equal the column's true min/max and
    -- the table's row count — which IS the contract extent elimination
    -- relies on (a wrong footer range silently breaks pruning; this
    -- row would catch it at any scale, including the multi-file sf1
    -- anchor).
    SELECT round(min(o_totalprice), 2) AS ext_min,
           round(max(o_totalprice), 2) AS ext_max,
           count(*) AS n_rows
    FROM orders
    """,
)
def extent_minmax_pseudocols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mariadb_columnstore_engine_spark.sources.maintenance import (
        extent_map,
    )

    stats = extent_map(spark, f"{sf_dir}/orders.parquet", ["o_totalprice"])
    ext_min = round(min(float(e["min"]) for e in stats), 2)
    ext_max = round(max(float(e["max"]) for e in stats), 2)
    n_rows = sum(int(e["num_rows"]) for e in stats)
    return spark.createDataFrame(
        [(ext_min, ext_max, n_rows)],
        "ext_min double, ext_max double, n_rows bigint",
    )
