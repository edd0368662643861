"""TPC-H anchor scale probe (VERDICT r9 #4): the 5 permanent bench
anchors — q1/q3/q5/q6/q10 — timed at two fixture scales through
Spark's noop sink (execution-only; the r8 methodology lesson: scale
probes never collect()).

The claim under test (SCALE.md): the flagship scan/join/agg plans are
one-shuffle aggregations / AQE-chosen joins whose wall-clock grows
~linearly (or better, while the scheduling floor amortizes) with fact
size. Unlike tools/tpch_scale_probe.py (fact-only amplification with
dims held constant), this probe uses the gen_sf_scale.py fixtures
where EVERY table scales — the same shape as running the reference's
own SF1 regression corpus 10x up
(devregression/t/mcs7536_q4_2.test:1-12 runs TPC-H SF1).

Usage: python tools/tpch_anchor_scale_probe.py [small_dir] [big_dir]
                                               [query ...]
Defaults: .fixtures/sf1 .fixtures/sf10 and the 5 TPC-H anchors; extra
args select other registry queries (r11: used to anchor the §2.5
window-lowering bench row at two scales). Prints one JSON line with
per-scale medians of 2 runs.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

QUERIES = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
)


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/sf1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".fixtures/sf10"
    queries = tuple(sys.argv[3:]) or QUERIES

    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session(
        "tpch-anchor-scale-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()

    out: dict = {"queries": {}}
    for sf_label, sf_dir in (("small", small), ("big", big)):
        out[f"{sf_label}_lineitem"] = spark.read.parquet(
            f"{sf_dir}/lineitem.parquet").count()
        for name in queries:
            times = []
            rows = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                df = qs[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
                if rows is None:
                    rows = df.count()
            out["queries"].setdefault(name, {})[sf_label] = {
                "median_s": round(statistics.median(times), 2),
                "runs": [round(t, 2) for t in times],
                "result_rows": rows,
            }
    for name, d in out["queries"].items():
        d["ratio_big_over_small"] = round(
            d["big"]["median_s"] / d["small"]["median_s"], 2
        )
    out["rows_ratio"] = round(
        out["big_lineitem"] / out["small_lineitem"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
