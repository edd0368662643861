"""Scale a fixture directory by an integer factor, preserving schema and
referential integrity — the local stand-in for dbgen at sf1 (the
reference's regression corpus scale, devregression/t/mcs7536_q4_2.test:3)
when no network dbgen is available.

Each replica i (0..N-1) shifts every key column by i * (max_key + 1) of
its domain, so replica sub-universes join exactly like the original:
orders.o_custkey still hits customer.c_custkey, lineitem hits orders /
part / supplier, events keep their user populations distinct per
replica. Dimension tables region/nation are constant 5/25 rows at every
TPC-H scale and are copied as-is. Timestamps and measures are kept
verbatim (the goal is plan/throughput behavior at 10x the rows, not new
value distributions). Deterministic by construction — no randomness.

Usage:
    python tools/gen_sf_scale.py /root/testdata/sf0.1 .fixtures/sf1 10
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.session import get_session

# table -> columns shifted by the domain max of the named source table
KEY_DOMAINS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events:event_id", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# primary key column per table (for domain-max lookup)
PK: dict[str, str] = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

CONSTANT_DIMS = ("region", "nation")


def scale_dir(src: str, dest: str, factor: int) -> None:
    spark = get_session("gen-sf-scale")
    # events.parquet is TIMESTAMP(NANOS) — same loader rule as catalog.py
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    maxes: dict[str, int] = {}

    def domain_max(domain: str) -> int:
        if domain not in maxes:
            if ":" in domain:
                tbl, col = domain.split(":")
            else:
                tbl, col = domain, PK[domain]
            df = spark.read.parquet(f"{src}/{tbl}.parquet")
            maxes[domain] = df.agg(F.max(col)).collect()[0][0]
        return maxes[domain]

    for tbl in CONSTANT_DIMS:
        spark.read.parquet(f"{src}/{tbl}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dest}/{tbl}.parquet")
        print(f"  {tbl}: copied (constant dim)")

    for tbl, shifts in KEY_DOMAINS.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        replicas = spark.range(factor).select(
            F.col("id").cast("int").alias("_rep")
        )
        out = df.crossJoin(F.broadcast(replicas))
        for col, domain in shifts.items():
            stride = int(domain_max(domain)) + 1
            dt = dict(df.dtypes)[col]
            out = out.withColumn(
                col,
                (F.col(col) + F.col("_rep").cast("long") * stride).cast(dt),
            )
        n_files = max(1, min(32, factor * 4))
        out.drop("_rep").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(f"{dest}/{tbl}.parquet")
        print(f"  {tbl}: x{factor} -> {dest}/{tbl}.parquet")

    spark.stop()


if __name__ == "__main__":
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale_dir(src, dest, factor)
