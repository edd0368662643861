"""Copy-on-write UPDATE/DELETE tests (DMLProc analogue)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.sources import dml


def _seed(spark, tmp_path) -> str:
    path = str(tmp_path / "dml_tbl")
    spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    ).write.parquet(path)
    return path


def test_delete_where(spark, tmp_path):
    path = _seed(spark, tmp_path)
    n = dml.delete_where(spark, path, F.col("id") >= 90)
    assert n == 90
    df = spark.read.parquet(path)
    assert df.count() == 90
    assert df.agg(F.max("id")).collect()[0][0] == 89


def test_update_where(spark, tmp_path):
    path = _seed(spark, tmp_path)
    dml.update_where(
        spark,
        path,
        F.col("grp") == 2,
        {"val": F.col("val") * 10, "grp": F.lit(99)},
    )
    df = spark.read.parquet(path)
    assert df.count() == 100  # update never changes cardinality
    updated = df.where(F.col("grp") == 99)
    assert updated.count() == 25
    # id=2 had val 4.0 -> 40.0; untouched id=1 keeps 2.0
    vals = {r.id: r.val for r in df.where(F.col("id").isin(1, 2)).collect()}
    assert vals[2] == 40.0 and vals[1] == 2.0


def test_update_with_partition_filter_only_rewrites_scope(spark, tmp_path):
    path = _seed(spark, tmp_path)
    dml.update_where(
        spark,
        path,
        (F.col("grp") == 1) & (F.col("id") < 10),
        {"val": F.lit(-1.0)},
        partition_filter=F.col("grp") == 1,
    )
    df = spark.read.parquet(path)
    assert df.count() == 100
    assert df.where(F.col("val") == -1.0).count() == 3  # ids 1,5,9
