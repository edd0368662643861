"""Concurrent-session parity probe (r11).

The reference is a MULTI-USER engine: ExeMgr/PrimProc serve many
sessions at once (dbcon/joblist/distributedenginecomm.cpp maintains
per-session job queues; mysql-test runs whole suites against a shared
server). Spark's analogue is many threads sharing one SparkSession —
each query gets its own job group, the scheduler interleaves stages.
Until r11 every parity record here was SERIAL; this probe evidences
that answers stay oracle-correct under interleaved execution.

Method: N worker threads each pull registry queries from a shared
deque and run them to completion against the SAME SparkSession while
a DuckDB connection per thread checks values (DuckDB connections are
cheap; cursors are not thread-safe across threads, so one per worker).
Any wrong answer, not just any crash, fails the probe.

Usage: python tools/concurrency_probe.py [sf_dir] [n_threads] [n_queries]
Defaults: /root/testdata/sf0.01, 4 threads, 40 queries (the priority
window head — the driver-checked surface). Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from collections import deque

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from mariadb_columnstore_engine_spark.oracle import (
        compare,
        duckdb_connect,
    )
    from mariadb_columnstore_engine_spark.plans import load_all
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session("concurrency-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in load_all().values() if s.oracle is not None]
    specs = specs[:n_queries]
    work = deque(specs)
    lock = threading.Lock()
    results: dict[str, str] = {}
    t0 = time.time()

    def worker(wid: int) -> None:
        con = duckdb_connect(sf_dir)
        while True:
            with lock:
                if not work:
                    break
                spec = work.popleft()
            try:
                # own job group per query: the scheduler interleaves
                # these across workers — the multi-session shape
                spark.sparkContext.setLocalProperty(
                    "spark.jobGroup.id", f"w{wid}-{spec.name}")
                problems = compare(spark, con, spec, sf_dir)
                with lock:
                    results[spec.name] = (
                        "ok" if not problems
                        else "DIFF: " + "; ".join(problems))
            except Exception as e:  # noqa: BLE001 — recorded
                with lock:
                    results[spec.name] = f"ERR: {type(e).__name__}: {e}"
        con.close()

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    n_ok = sum(1 for v in results.values() if v == "ok")
    bad = {k: v[:300] for k, v in results.items() if v != "ok"}
    print(json.dumps({
        "sf_dir": sf_dir,
        "threads": n_threads,
        "queries": len(results),
        "ok": n_ok,
        "failed": bad,
        "wall_sec": round(time.time() - t0, 1),
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
