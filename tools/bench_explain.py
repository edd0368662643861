"""Capture .explain("formatted") for bench queries → plans/r12/<name>_<tag>.txt.

Usage: python tools/bench_explain.py <tag> [name_filter ...]

Runs under the SAME session configuration bench.py uses (tuned conf,
local[$SPARK_GRAFT_CPUS], 2 MB scan splits at fixture scale) so the
captured plan is the one the bench actually executes. AQE's final plan
differs at runtime (coalesced exchanges, runtime join demotion); the
static formatted plan still pins Exchange count, join strategy,
PushedFilters/ReadSchema and Python-eval nodes, which is what the
optimization evidence needs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mariadb_columnstore_engine_spark.plans import load_all
from mariadb_columnstore_engine_spark.session import get_session


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    filters = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)

    specs = [s for s in load_all().values() if s.bench]
    if filters:
        specs = [
            s for s in load_all().values()
            if any(f in s.name for f in filters)
        ]
    spark = get_session(
        "mcs-spark-explain",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    for spec in sorted(specs, key=lambda s: s.name):
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{spec.name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
