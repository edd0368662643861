"""Chunked parity sweep: run check_parity in a FRESH process per chunk
of registry queries and aggregate the tallies.

Why: the parity contract is per-query, but a single 180-query session at
sf1 accumulates JVM pressure (localCheckpoint blocks, broadcast cleanup
backlog, GCLocker contention) that can fail arbitrary late queries with
spurious OOMs — a harness artifact, not an engine property. One process
per chunk caps accumulation at chunk size; every query still runs.

Usage:
    python tools/sweep_chunked.py /root/repo/.fixtures/sf1 [chunk_size]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys


def main() -> int:
    sf_dir = sys.argv[1]
    chunk_size = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    sys.path.insert(0, repo)
    from mariadb_columnstore_engine_spark.plans import load_all

    names = list(load_all())
    chunks = [
        names[i : i + chunk_size] for i in range(0, len(names), chunk_size)
    ]
    total_ok = total_fail = total_rows = 0
    failures: list[str] = []
    for idx, chunk in enumerate(chunks):
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(here, "check_parity.py"),
             sf_dir, *chunk],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": repo},
        )
        out = proc.stdout
        m = re.search(
            r"(\d+) ok, (\d+) rows-only, (\d+) failed, (\d+) total", out
        )
        if not m:
            print(f"chunk {idx}: sweep process died (rc={proc.returncode})")
            failures.append(f"chunk-{idx}:process-died")
            total_fail += len(chunk)
            continue
        ok, rows_only, fail, tot = map(int, m.groups())
        if tot != len(chunk):
            # a substring-matched stray would break per-query accounting
            print(f"chunk {idx}: matched {tot} queries, expected "
                  f"{len(chunk)}")
        total_ok += ok
        total_rows += rows_only
        total_fail += fail
        for line in out.splitlines():
            if line.startswith("FAIL"):
                failures.append(line)
        print(f"chunk {idx:>2} ({chunk[0]} ..): "
              f"{ok} ok, {rows_only} rows-only, {fail} failed")
    print()
    for f in failures:
        print(f)
    print(
        f"\nTOTAL: {total_ok} ok, {total_rows} rows-only, "
        f"{total_fail} failed"
    )
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
