"""Extent-elimination scale probe.

Measures explicit footer-stat file pruning (sources/maintenance.
extent_eliminate — the TupleBPS casual-partitioning analogue,
tuple-bps.cpp:507-508) against Spark's own pushed-filter scan over the
same clustered table, at growing row counts. Both variants return
identical aggregates (asserted).

What to expect, and why this still matters when Spark already does
row-group skipping: the pushed-filter scan must still LIST and OPEN
every file (footer read per task) before its row groups are skipped;
explicit elimination removes the files from the plan, so scan-task
count scales with SELECTED extents, not total extents. On local[32]
with warm page cache the gap is modest — the point of recording it is
the TREND (flat selected-side cost as total extents grow) plus the
measured driver-side cost of the footer pass itself, which is the
extent-map read a 100 TB deployment would serve from a persisted
relation instead.

Usage: python tools/extent_scale_probe.py [rows_millions ...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from mariadb_columnstore_engine_spark.session import get_session  # noqa: E402
from mariadb_columnstore_engine_spark.sources import maintenance  # noqa: E402


def probe(spark, n_rows: int, n_files: int) -> dict:
    dest = tempfile.mkdtemp(prefix="extent_probe_") + "/t"
    try:
        (
            spark.range(0, n_rows)
            .select(F.col("id").alias("k"), (F.col("id") % 997).alias("v"))
            .repartitionByRange(n_files, "k")
            .write.parquet(dest)
        )
        lo, hi = n_rows // 2, n_rows // 2 + n_rows // n_files - 1

        def run_full():
            return (
                spark.read.parquet(dest)
                .where((F.col("k") >= lo) & (F.col("k") <= hi))
                .agg(F.count("*"), F.sum("v"))
                .collect()[0]
            )

        t0 = time.monotonic()
        stats = maintenance.extent_map(spark, dest, ["k"])
        t_footer = time.monotonic() - t0

        def run_pruned():
            return (
                maintenance.scan_extent_eliminated(
                    spark, dest, "k", lo, hi, stats=stats
                )
                .agg(F.count("*"), F.sum("v"))
                .collect()[0]
            )

        # warm both once, then best-of-3
        r_full, r_pruned = run_full(), run_pruned()
        assert tuple(r_full) == tuple(r_pruned), (r_full, r_pruned)
        t_full = min(
            (lambda s: (run_full(), time.monotonic() - s)[1])(
                time.monotonic()
            )
            for _ in range(3)
        )
        t_pruned = min(
            (lambda s: (run_pruned(), time.monotonic() - s)[1])(
                time.monotonic()
            )
            for _ in range(3)
        )
        kept, skipped = maintenance.extent_eliminate(
            spark, dest, "k", lo, hi, stats=stats
        )
        return {
            "rows": n_rows,
            "files": n_files,
            "kept": len(kept),
            "skipped": len(skipped),
            "footer_pass_s": round(t_footer, 3),
            "full_scan_s": round(t_full, 3),
            "pruned_scan_s": round(t_pruned, 3),
        }
    finally:
        shutil.rmtree(dest.rsplit("/", 1)[0], ignore_errors=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_session("extent-scale-probe")
    for m in sizes:
        out = probe(spark, m * 1_000_000, max(16, m * 2))
        print(out)
