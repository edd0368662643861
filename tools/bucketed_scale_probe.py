"""Bucketed-join scale probe: shuffle join vs bucketed co-located join
on amplified orders/customer.

Amplifies both join sides by COPIES (key-offset replicas, so the join
cardinality scales linearly, never quadratically), then times the same
join+aggregation two ways:

  1. plain parquet inputs (AQE picks a shuffle join — both sides
     exchange on the key), and
  2. pre-bucketed tables (8..64 buckets on the join key; zero hash
     exchange — each task reads matching bucket files from both sides).

This measures the claim SCALE.md makes for write-time pre-partitioning:
the bucketed plan's advantage GROWS with data size because the shuffle
it removes scales with both inputs while bucket-aligned reads scale
with per-bucket volume. Broadcast is disabled for the comparison (at
100 TB neither side fits a broadcast anyway — local[32] would happily
broadcast the toy customer table and hide the effect being measured).

Usage: python tools/bucketed_scale_probe.py [sf_dir] [copies] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from mariadb_columnstore_engine_spark.session import get_session
    from mariadb_columnstore_engine_spark.sources.ingest import (
        write_bucketed,
    )

    spark = get_session(
        "bucketed-scale-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_cust = cust.count()
    offset = 10 ** len(str(n_cust * copies + 1))
    reps = spark.range(copies).select(F.col("id").alias("_r"))
    cust_amp = cust.crossJoin(reps).select(
        (F.col("c_custkey") + F.col("_r") * offset).alias("c_custkey"),
        "c_name",
    )
    orders_amp = orders.crossJoin(reps).select(
        "o_orderkey",
        (F.col("o_custkey") + F.col("_r") * offset).alias("o_custkey"),
        "o_totalprice",
    )

    def join_agg(c, o):
        return (
            c.join(o, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_totalprice").alias("total"),
            )
        )

    def timed(df):
        t0 = time.time()
        n = df.count()
        return round(time.time() - t0, 3), n

    # 1) shuffle join on raw (amplified) inputs — write them out first so
    # both strategies read comparable parquet, not an in-memory lineage
    work = tempfile.mkdtemp(prefix="bkt_probe_")
    try:
        cust_path = os.path.join(work, "cust_plain")
        ord_path = os.path.join(work, "ord_plain")
        cust_amp.write.parquet(cust_path)
        orders_amp.write.parquet(ord_path)
        c_plain = spark.read.parquet(cust_path)
        o_plain = spark.read.parquet(ord_path)
        shuffle_s, n1 = timed(join_agg(c_plain, o_plain))
        shuffle_plan = (
            join_agg(c_plain, o_plain)
            ._jdf.queryExecution().executedPlan().toString()
        )

        # 2) bucketed twins
        t0 = time.time()
        write_bucketed(
            c_plain, "probe_cust", bucket_cols=["c_custkey"],
            n_buckets=n_buckets, sort_cols=["c_custkey"],
            path=os.path.join(work, "cust_bkt"),
        )
        write_bucketed(
            o_plain, "probe_ord", bucket_cols=["o_custkey"],
            n_buckets=n_buckets, sort_cols=["o_custkey"],
            path=os.path.join(work, "ord_bkt"),
        )
        bucket_write_s = round(time.time() - t0, 3)
        cb, ob = spark.table("probe_cust"), spark.table("probe_ord")
        bucketed_s, n2 = timed(join_agg(cb, ob))
        bucketed_plan = (
            join_agg(cb, ob)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert n1 == n2, (n1, n2)
        print(json.dumps({
            "copies": copies,
            "n_buckets": n_buckets,
            "rows_joined_groups": n1,
            "shuffle_join_sec": shuffle_s,
            "bucketed_join_sec": bucketed_s,
            "bucket_write_sec": bucket_write_s,
            "shuffle_exchanges_in_shuffle_plan":
                shuffle_plan.count("Exchange hashpartitioning"),
            "shuffle_exchanges_in_bucketed_plan":
                bucketed_plan.count("Exchange hashpartitioning"),
        }))
    finally:
        spark.sql("DROP TABLE IF EXISTS probe_cust")
        spark.sql("DROP TABLE IF EXISTS probe_ord")
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
