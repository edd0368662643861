"""Table maintenance: small-file compaction and layout auditing.

Reference analogue: ColumnStore's storage maintenance jobs — DBRoot
redistribution (writeengine/redistribute/) moves extents between roots
to rebalance, and the extent map keeps allocation coarse (8M rows/extent,
versioning/BRM/extentmap.cpp:6077) precisely so the table never degrades
into tiny fragments. A Parquet lake has the opposite failure mode:
incremental appends (sources/dml.py copy-on-write, streaming sinks)
accumulate many small files, which at 100 TB means scan tasks dominated
by open/seek overhead and useless row-group stats. Compaction is the
maintenance pass that restores the "few large, clustered extents" layout
the reference gets from its allocator.

Scale shape: one ``repartitionByRange`` (when re-clustering) or a
coalescing repartition — a single shuffle sized by target file count; the
swap is pure filesystem metadata. On object stores a table format
(Delta/Iceberg) would make the swap atomic via manifest commit; this
module's delete-then-rename is the plain-filesystem analogue and is
documented as such (the reference's redistribution likewise locks the
affected extents, writeengine/redistribute/we_redistributecontrol.cpp).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` (any FS scheme)."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith((".parquet", ".orc")) and not name.startswith("_"):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def layout_stats(spark: SparkSession, path: str) -> dict:
    """Small-file audit: the numbers a maintenance scheduler alerts on."""
    files = data_files(spark, path)
    sizes = [b for _, b in files]
    total = sum(sizes)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_bytes": total // len(files) if files else 0,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def compact_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    cluster_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    codec: str = "snappy",
    format: str = "parquet",
) -> dict:
    """Rewrite ``path`` into ~``target_file_mb``-sized files, optionally
    re-clustering (restores row-group min/max selectivity the way the
    reference's extent allocation keeps casual-partitioning stats tight).

    Returns ``{files_before, files_after, bytes_before}``. The rewrite
    lands in a sibling temp dir and replaces the original via
    delete+rename — crash between the two leaves the temp dir intact for
    manual recovery; use a table format for transactional swaps.
    """
    before = layout_stats(spark, path)
    if format == "parquet":
        from mariadb_columnstore_engine_spark.sources.ingest import (
            _evolution as _evo_peek,
        )

        _e = _evo_peek(path)
        if _e.get("disabled_partitions") and (
            _e.get("added") or _e.get("dropped")
            or _e.get("renamed") or _e.get("retyped")
        ):
            raise ValueError(
                "table has disabled partitions AND pending instant-"
                "ALTER debt; calenablepartitions first, then compact"
            )
    if format == "parquet":
        # read through the schema-evolution sidecar: the rewrite
        # MATERIALIZES pending instant ALTERs (added columns become
        # physical with their defaults, dropped ones disappear) and the
        # sidecar is consumed by the swap — the reference's lazy-ALTER
        # debt is likewise settled by the next extent rewrite
        from mariadb_columnstore_engine_spark.sources.ingest import (
            read_table_evolved,
        )

        df = read_table_evolved(spark, path)
    else:
        df = spark.read.format(format).load(path)
    n_out = max(1, math.ceil(before["total_bytes"] / (target_file_mb << 20)))
    if cluster_by:
        writer_df = df.repartitionByRange(
            n_out, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    else:
        writer_df = df.repartition(n_out)
    tmp = path.rstrip("/") + "_compact_tmp"
    writer = writer_df.write.option("compression", codec).mode("overwrite")
    if partition_by:
        # preserve (or establish) hive-style directory partitioning —
        # compacting a partitioned table without this flattens its layout
        # and silently loses planning-time partition pruning
        writer = writer.partitionBy(*partition_by)
    writer.format(format).save(tmp)
    fs, jpath, jvm = _hadoop_fs(spark, path)
    if format == "parquet":
        from mariadb_columnstore_engine_spark.sources.ingest import (
            _evolution,
            _write_evolution,
        )

        evo = _evolution(path)
    else:
        evo = {}
    # disabled partitions were excluded from the compaction read
    # (read_table_evolved skips their files) — carry them byte-wise or
    # the delete+rename would destroy them
    disabled = set(evo.get("disabled_partitions", []))
    if disabled:
        import os as _os
        import shutil as _shutil

        from mariadb_columnstore_engine_spark.sources.ingest import (
            _live_data_files,
        )

        for f in _live_data_files(path, set()):
            if _os.path.basename(f) in disabled:
                rel = _os.path.relpath(f, path)
                dst = _os.path.join(tmp, rel)
                _os.makedirs(_os.path.dirname(dst), exist_ok=True)
                _shutil.copy2(f, dst)
    fs.delete(jpath, True)
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath):
        raise IOError(f"compact_table: rename {tmp} -> {path} failed")
    # Materialization settles only the 'added'/'dropped' debt. CHECK
    # constraints are not materializable state, and generated columns
    # must keep computing on future INSERTs (MariaDB PERSISTENT computes
    # on insert; a plain physical column would be NULL-filled) — both
    # survive compaction in a fresh sidecar.
    surviving_defaults = {
        c["name"]: c["default"]
        for c in evo.get("added", [])
        if c.get("default") is not None
    }
    surviving_defaults.update(evo.get("defaults", {}))
    for r in evo.get("renamed", []):  # renames materialized by compaction
        if r["from"] in surviving_defaults:
            surviving_defaults[r["to"]] = surviving_defaults.pop(r["from"])
    if (evo.get("generated") or evo.get("checks") or surviving_defaults
            or evo.get("autoinc") or disabled):
        fresh = {
            "added": [],
            "dropped": [],
            "generated": evo.get("generated", []),
            "checks": evo.get("checks", []),
            "defaults": surviving_defaults,
        }
        # AUTO_INCREMENT counter is sequence state, not layout debt
        if evo.get("autoinc"):
            fresh["autoinc"] = evo["autoinc"]
        if disabled:
            fresh["disabled_partitions"] = sorted(disabled)
        _write_evolution(path, fresh)
    after = layout_stats(spark, path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "bytes_before": before["total_bytes"],
    }


def extent_map(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> list[dict]:
    """Row-group statistics view — the extent-map / casual-partitioning
    observable (reference: information_schema.columnstore_extents backed
    by versioning/BRM/extentmap.h min/max entries). One dict per
    (file, row_group, column): min, max, null_count, num_rows — read
    from parquet footers via pyarrow, no data scan. This is the tool to
    audit whether ``cluster_by`` actually produced prunable extents."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for fpath, _ in data_files(spark, path):
        local = fpath[len("file:") :] if fpath.startswith("file:") else fpath
        meta = pq.ParquetFile(local).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci, name in enumerate(names):
                if columns and name not in columns:
                    continue
                st = g.column(ci).statistics
                out.append(
                    {
                        "file": local.rsplit("/", 1)[-1],
                        "row_group": rg,
                        "column": name,
                        "num_rows": g.num_rows,
                        "min": st.min if st and st.has_min_max else None,
                        "max": st.max if st and st.has_min_max else None,
                        "null_count": st.null_count if st else None,
                    }
                )
    return out


# ---------------------------------------------------------------------------
# Partition management (ha_mcs_partition.cpp: calshowpartitions /
# caldisablepartitions / calenablepartitions / caldroppartitions;
# udf_calshowpartitions.test). The partition unit here is a data FILE —
# the extent analogue: it has footer min/max (casual partitioning), can
# be excluded from scans without being opened, and can be dropped O(1).


def show_partitions(
    spark: SparkSession, path: str, column: str
) -> list[dict]:
    """calshowpartitions('t','col'): one row per data file with the
    column's min/max (from parquet footers, no scan) and its
    Enabled/Disabled status."""
    import os

    import pyarrow.parquet as pq

    from mariadb_columnstore_engine_spark.sources.ingest import (
        _evolution,
        _live_data_files,
    )

    disabled = set(
        _evolution(path).get("disabled_partitions", [])
    )
    out = []
    for f in _live_data_files(path, set()):
        meta = pq.ParquetFile(f).metadata
        names = [
            meta.schema.column(i).name for i in range(meta.num_columns)
        ]
        mn = mx = None
        if column in names:
            ci = names.index(column)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st and st.has_min_max:
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
        name = os.path.basename(f)
        out.append(
            {
                "partition": name,
                "min": mn,
                "max": mx,
                "status": "Disabled" if name in disabled else "Enabled",
            }
        )
    return out


def _set_partition_status(
    path: str, partitions: list[str], *, disabled: bool
) -> int:
    import os

    from mariadb_columnstore_engine_spark.sources.ingest import (
        _evolution,
        _live_data_files,
        _write_evolution,
    )

    known = {
        os.path.basename(f) for f in _live_data_files(path, set())
    }
    missing = [p for p in partitions if p not in known]
    if missing:
        raise ValueError(f"no such partition(s): {missing}")
    evo = _evolution(path)
    cur = set(evo.get("disabled_partitions", []))
    cur = cur | set(partitions) if disabled else cur - set(partitions)
    if cur:
        evo["disabled_partitions"] = sorted(cur)
    else:
        evo.pop("disabled_partitions", None)
    _write_evolution(path, evo)
    return len(partitions)


def disable_partitions(path: str, partitions: list[str]) -> int:
    """caldisablepartitions: mark files invisible to scans and DML.
    O(1) metadata — the files are never opened again until re-enabled."""
    return _set_partition_status(path, partitions, disabled=True)


def enable_partitions(path: str, partitions: list[str]) -> int:
    """calenablepartitions: undo disable_partitions."""
    return _set_partition_status(path, partitions, disabled=False)


def drop_partitions(spark: SparkSession, path: str,
                    partitions: list[str]) -> int:
    """caldroppartitions: physically remove the files (O(1) per file, no
    rewrite of survivors — the reference's extent drop). Refuses to drop
    every file: an empty directory loses the table's schema."""
    import os

    from mariadb_columnstore_engine_spark.sources.ingest import (
        _evolution,
        _live_data_files,
        _write_evolution,
    )

    all_files = _live_data_files(path, set())
    by_name = {os.path.basename(f): f for f in all_files}
    missing = [p for p in partitions if p not in by_name]
    if missing:
        raise ValueError(f"no such partition(s): {missing}")
    if len(partitions) >= len(all_files):
        raise ValueError(
            "cannot drop every partition (schema would be lost); "
            "use TRUNCATE"
        )
    for p in partitions:
        os.remove(by_name[p])
    evo = _evolution(path)
    cur = set(evo.get("disabled_partitions", [])) - set(partitions)
    if cur:
        evo["disabled_partitions"] = sorted(cur)
    else:
        evo.pop("disabled_partitions", None)
    _write_evolution(path, evo)
    spark.catalog.clearCache()
    return len(partitions)


# ---------------------------------------------------------------------------
# Extent elimination (TupleBPS casual partitioning: tuple-bps.cpp:507-508
# consults the BRM extent map's per-extent min/max to skip extents whose
# range cannot satisfy the pushed predicate, before any block is read).
# The file analogue: select data files by footer stats, then build the
# scan over the survivors only. Spark's parquet reader already does the
# in-scan complement (row-group skipping from the same footer stats via
# pushed filters); this explicit pass removes files from the plan
# entirely — fewer scan tasks, fewer footer opens on the executors.
#
# Scale note: the footer pass is a DRIVER-side metadata read, O(files).
# That mirrors BRM (the extent map is centralized metadata, not data),
# but at 100 TB the map should be computed once and persisted —
# extent_map()'s output is exactly that relation; pass it in via
# `stats` to skip re-reading footers.


def extent_eliminate(
    spark: SparkSession,
    path: str,
    column: str,
    lo=None,
    hi=None,
    stats: list[dict] | None = None,
) -> tuple[list[str], list[str]]:
    """Partition the table's live data files into (kept, skipped) for the
    predicate ``lo <= column <= hi`` (either bound may be None) using
    footer min/max only. A file with no stats for the column is always
    kept (cannot prove it irrelevant — same conservative rule as the
    reference's invalid casual-partitioning ranges)."""
    import os

    from mariadb_columnstore_engine_spark.sources.ingest import (
        _evolution,
        _live_data_files,
    )

    disabled = set(_evolution(path).get("disabled_partitions", []))
    live = _live_data_files(path, disabled)
    if stats is None:
        stats = extent_map(spark, path, [column])
    # file-level range = union of its row-group ranges; any None → unknown
    ranges: dict[str, tuple] = {}
    for e in stats:
        if e["column"] != column:
            continue
        mn, mx = ranges.get(e["file"], (e["min"], e["max"]))
        if e["min"] is None or e["max"] is None or mn is None or mx is None:
            ranges[e["file"]] = (None, None)
        else:
            ranges[e["file"]] = (min(mn, e["min"]), max(mx, e["max"]))
    kept, skipped = [], []
    for f in live:
        mn, mx = ranges.get(os.path.basename(f), (None, None))
        dead = (
            mn is not None
            and mx is not None
            and ((lo is not None and mx < lo) or (hi is not None and mn > hi))
        )
        (skipped if dead else kept).append(f)
    return kept, skipped


def scan_extent_eliminated(
    spark: SparkSession,
    path: str,
    column: str,
    lo=None,
    hi=None,
    stats: list[dict] | None = None,
) -> DataFrame:
    """Scan with explicit extent elimination: read only the files whose
    footer range can overlap ``[lo, hi]``, then apply the residual
    predicate (footer ranges are necessary, not sufficient). Equivalent
    to ``read + filter`` by construction; cheaper by len(skipped) scan
    tasks."""
    kept, skipped = extent_eliminate(spark, path, column, lo, hi, stats)
    if not kept:
        # Every live file was pruned (predicate fully out of range).
        # spark.read.parquet() with zero paths raises "unable to infer
        # schema"; the correct result is an empty relation with the table
        # schema, so borrow it from a pruned file's footer (skipped files
        # still carry the schema — only their value ranges were dead).
        if not skipped:
            raise ValueError(f"no live data files under {path}")
        return spark.read.parquet(*skipped).limit(0)
    df = spark.read.parquet(*kept)
    c = F.col(column)
    if lo is not None:
        df = df.where(c >= F.lit(lo))
    if hi is not None:
        df = df.where(c <= F.lit(hi))
    return df
