"""Salted two-stage aggregation equals the direct aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("s"),
        )
        .collect()
    }
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [
            F.count(F.lit(1)).alias("pn"),
            F.sum("l_quantity").alias("ps"),
        ],
        lambda: [
            F.sum("pn").alias("n"),
            F.sum("ps").alias("s"),
        ],
        n_salts=8,
        salt_source="l_orderkey",
    )
    got = {
        r.l_returnflag: (r.n, round(r.s, 2)) for r in salted.collect()
    }
    assert got == direct


def test_salted_join_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    direct = (
        li.join(supp, "l_suppkey")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    from mariadb_columnstore_engine_spark.operators.skew import salted_join

    salted = (
        salted_join(li, supp, "l_suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    d = {r.s_nationkey: (r.n, round(r.q, 2)) for r in direct.collect()}
    s = {r.s_nationkey: (r.n, round(r.q, 2)) for r in salted.collect()}
    assert s == d
