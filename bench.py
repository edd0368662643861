"""Headline benchmark harness.

Runs every ``bench=True`` query from the registry against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": 0.1}

Per query: one untimed warmup run (JVM/codegen/page-cache warmup — the
reference's sysbench harness likewise reports steady-state q/s,
benchmarks/bench.sh:20-28), then the median of ``BENCH_REPEATS`` timed
runs. Timing covers full plan execution via ``collect()``; every headline
query returns a small aggregate, so driver-side transfer is negligible.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mariadb_columnstore_engine_spark.plans import load_all
from mariadb_columnstore_engine_spark.session import get_session

BENCH_REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))

# BENCH_SINK=collect / noop forces one sink for every query. Unset
# (default, r12), each QuerySpec's declared sink is used: collect()
# for small-aggregate results (py4j transfer is negligible and the
# r1-r11 methodology is preserved), the noop writer (guide §1.4) for
# the two LARGE-relation outputs (events_sessionization ~1 row/session,
# win_window_lowering_bench 1 row/input row) whose collect() timing
# was dominated by per-row Python deserialization that a cluster
# deployment never pays — it writes results to storage instead.
# Declared measurement-methodology fix, r12 (OPTIMIZATION_r12.md
# records both sinks' numbers for those queries).
BENCH_SINK = os.environ.get("BENCH_SINK")

# BENCH_WARMUP=0 skips the untimed warmup run. The warmup matters for
# sub-second headline queries (JVM/codegen/page-cache); for multi-minute
# scale probes it doubles wall-clock while the JVM is already warm after
# the first stages.
BENCH_WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))


def _run(df, spec_sink: str = "collect") -> None:
    sink = BENCH_SINK or spec_sink
    if sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    # BENCH_QUERIES=name1,name2 overrides the bench=True sample — used
    # to time the sf1 heavy tail (fixpoint dedup loops, skew operators)
    # that is deliberately NOT in the per-round headline set (BENCH.md
    # records the command + JSON line each round)
    names = os.environ.get("BENCH_QUERIES")
    if names:
        all_q = load_all()
        specs = [all_q[n.strip()] for n in names.split(",") if n.strip()]
    else:
        specs = [s for s in load_all().values() if s.bench]
    spark = get_session(
        "mcs-spark-bench",
        extra_conf={
            # Local-bench heap: the default 1g driver heap causes GC noise
            # in local mode where the driver hosts all executor threads.
            "spark.driver.memory": "24g",
            # Scan-partition sizing scaled to the fixture: at sf0.1 the
            # biggest table is ~11 MB, so the production default (128 MB)
            # would give every scan a single task. 2 MB splits fan the scan
            # across cores. At cluster scale the ENGINE_CONF default stands.
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            # No UI server / console progress during timed runs — the
            # event-bus listeners and Jetty are monitoring overhead the
            # measurement does not want (guide §1; launch-time confs).
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for spec in sorted(specs, key=lambda s: s.name):
        sink = getattr(spec, "sink", "collect")
        if BENCH_WARMUP:
            _run(spec.fn(spark, sf_dir), sink)  # JIT/codegen warmup
        runs = []
        for _ in range(BENCH_REPEATS):
            t0 = time.perf_counter()
            _run(spec.fn(spark, sf_dir), sink)
            runs.append(time.perf_counter() - t0)
        timings[spec.name] = round(statistics.median(runs), 4)
        print(f"# {spec.name}: {timings[spec.name]:.3f}s "
              f"(runs: {[round(r, 3) for r in runs]})", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total_median_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
