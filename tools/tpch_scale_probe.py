"""TPC-H scale probe: amplify lineitem/orders N× and measure headline
queries at both scales.

The claim under test is SCALE.md's: the TPC-H plans are one-shuffle
aggregations / AQE-chosen joins whose wall-clock grows ~linearly with
fact-table size (no quadratic candidate generation, no driver-side
loops). Amplification replicates lineitem+orders with orderkey offsets
(orders fan out onto the SAME customers/parts/suppliers — dims hold
still exactly as they do when a real fact table grows), so q1/q3/q6
do N× the scan/agg work over the same key space.

Usage: python tools/tpch_scale_probe.py [sf_dir] [copies]
Prints one JSON line:
  {"rows_lineitem": ..., "copies": ..., "queries": {...}}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F


QUERIES = (
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "tpch_q3_shipping_priority",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session(
        "tpch-scale-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    offset = 10 ** len(str(max_ok * copies))
    rep = spark.range(copies).select(F.col("id").alias("_copy"))

    tmp = tempfile.mkdtemp(prefix="tpch_scale_")
    li.crossJoin(rep).select(
        (F.col("l_orderkey") + F.col("_copy") * offset).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).write.parquet(f"{tmp}/lineitem.parquet")
    orders.crossJoin(rep).select(
        (F.col("o_orderkey") + F.col("_copy") * offset).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    ).write.parquet(f"{tmp}/orders.parquet")
    import shutil

    for dim in ("customer", "supplier", "part", "nation", "region",
                "events", "documents", "embeddings"):
        shutil.copy(f"{sf_dir}/{dim}.parquet", f"{tmp}/{dim}.parquet")

    n_li = spark.read.parquet(f"{tmp}/lineitem.parquet").count()
    specs = load_all()
    out = {}
    for name in QUERIES:
        # untimed warmup then timed run (JIT/page-cache parity with bench.py)
        specs[name].fn(spark, tmp).count()
        t0 = time.time()
        n = specs[name].fn(spark, tmp).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {"rows_lineitem": n_li, "copies": copies, "queries": out}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
