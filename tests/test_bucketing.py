"""Bucketed co-located join: same-key bucketed tables must join with NO
shuffle exchange (the write-time pre-partitioning scale strategy)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.sources import ingest


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("lv")
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("rv")
    )
    try:
        ingest.write_bucketed(
            left, "bkt_left", bucket_cols=["k"], n_buckets=8,
            sort_cols=["k"], path=str(tmp_path / "bkt_left"),
        )
        ingest.write_bucketed(
            right, "bkt_right", bucket_cols=["k"], n_buckets=8,
            sort_cols=["k"], path=str(tmp_path / "bkt_right"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_left").join(
                spark.table("bkt_right"), "k"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, (
                "bucketed join still shuffles:\n" + plan
            )
            assert joined.count() == 500
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
