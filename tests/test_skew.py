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


def test_salted_join_rejects_small_side_preserving_how(spark, sf_dir):
    """Replicating the small side n_salts times makes right/full outer
    (and right-semi) joins emit unmatched small rows n_salts times, so
    the operator must refuse them."""
    import pytest

    from mariadb_columnstore_engine_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError):
            salted_join(li, supp, "l_suppkey", how=how)


def test_salted_agg_content_hash_fallback_spreads_hot_key(spark):
    """Without salt_source the salt derives from row CONTENT, so a hot
    key packed into one input partition still fans across reducers."""
    from mariadb_columnstore_engine_spark.operators.skew import salted_agg

    # one key, one input partition — the motivating worst case
    df = spark.range(0, 1000, 1, 1).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    stage1_salts = (
        df.withColumn(
            "_salt", F.pmod(F.hash(F.col("v")), F.lit(8))
        ).select("_salt").distinct().count()
    )
    assert stage1_salts > 1  # content hash actually spreads

    out = salted_agg(
        df,
        ["k"],
        [F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps")],
        lambda: [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        n_salts=8,
    )
    row = out.collect()[0]
    assert (row.n, row.s) == (1000, sum(range(1000)))


def test_fallback_salt_spreads_identical_rows(spark):
    """The worst-case skew input — one hot key whose rows are all
    byte-identical — must still fan across multiple stage-1 groups
    (a content-hash salt would collapse it to one reducer)."""
    df = spark.createDataFrame(
        [("hot", 1)] * 1000, "k string, v int"
    ).repartition(2)
    import pyspark.sql.functions as F

    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8))
    n_groups = (
        df.withColumn("_salt", salt).select("k", "_salt").distinct().count()
    )
    assert n_groups == 8  # round-robin hits every salt
    out = salted_agg(
        df,
        ["k"],
        [F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps")],
        lambda: [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        n_salts=8,
    ).collect()
    assert len(out) == 1 and out[0].n == 1000 and out[0].s == 1000
