"""Spill-under-pressure probe (VERDICT r9 #5): demonstrate the
SURVEY §2.3/§2.4 parity claim that Spark natively provides what the
reference builds as DiskJoinStep / RowAggStorage disk generations
(dbcon/joblist/diskjoinstep.cpp; utils/rowgroup/rowstorage.h:90,298).

Method: run sf1 join/agg/window registry rows in a DELIBERATELY tiny
memory envelope — small heap, execution-memory fraction floored, few
fat shuffle partitions — then read per-stage spill metrics from the
Spark status REST API and oracle-check the results against DuckDB at
the same SF. Green parity WITH memoryBytesSpilled/diskBytesSpilled > 0
is the evidence: the operators complete correct answers while spilling
to disk, exactly the reference's disk-join/disk-agg degradation path.

Must run as its own process (heap size is a JVM launch option).

Usage: python tools/spill_probe.py [sf_dir] [query ...]
Default: .fixtures/sf1 and the three headline shapes below.
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

#: join-heavy (multi lineitem⋈orders⋈supplier semi/anti chain — SMJ
#: sort spill), agg-heavy (session windows over the events stream),
#: window/sort-heavy (global top-k over scored embeddings), and —
#: since r11 — text_minhash_lsh_dedup: its verify join is now
#: envelope-aware (plans/text_plans.py _choose_verify_hint): under
#: this tiny envelope the estimated build exceeds the per-task budget
#: so the plan degrades from the pinned shuffle_hash (whose hash
#: relation BUILD cannot spill — the gap the reference plugs with
#: DiskJoinStep) to a broadcast-free sort-merge join that spills
#: natively, instead of failing fast.
DEFAULT_QUERIES = (
    "tpch_q21_suppliers_kept_waiting",
    "events_sessionization",
    "sim_bruteforce_cosine_topk",
    "text_minhash_lsh_dedup",
)

UI_PORT = 4077


def stage_spill_totals() -> tuple[int, int]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".fixtures/sf1"
    names = tuple(sys.argv[2:]) or DEFAULT_QUERIES

    from mariadb_columnstore_engine_spark.oracle import (
        compare,
        duckdb_connect,
    )
    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session(
        "spill-probe",
        "local[4]",
        shuffle_partitions=2,  # fat partitions: force per-task pressure
        extra_conf={
            # tiny heap for sf1 (bench uses 24g for the same data) +
            # floored execution/storage share: the point is to make
            # hash aggregates, sort-merge joins, and window sorts
            # exceed execution memory and take their spill paths
            "spark.driver.memory": "1500m",
            "spark.memory.fraction": "0.2",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    con = duckdb_connect(sf_dir)

    out: dict = {"sf_dir": sf_dir, "conf": {
        "driver_memory": "1500m", "memory_fraction": 0.2,
        "shuffle_partitions": 2, "master": "local[4]"}, "queries": {}}
    for name in names:
        before = stage_spill_totals()
        t0 = time.monotonic()
        try:
            problems = compare(spark, con, qs[name], sf_dir)
        except Exception as e:  # noqa: BLE001 — reported, not fatal
            problems = [f"{type(e).__name__}: {e}"[:200]]
        wall = time.monotonic() - t0
        after = stage_spill_totals()
        out["queries"][name] = {
            "parity": "ok" if not problems else problems,
            "sec": round(wall, 1),
            "memory_spilled_bytes": after[0] - before[0],
            "disk_spilled_bytes": after[1] - before[1],
        }
        print(f"# {name}: {out['queries'][name]}", file=sys.stderr,
              flush=True)
    out["total_memory_spilled"] = sum(
        q["memory_spilled_bytes"] for q in out["queries"].values())
    out["total_disk_spilled"] = sum(
        q["disk_spilled_bytes"] for q in out["queries"].values())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
