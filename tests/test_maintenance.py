"""Small-file compaction / layout audit (sources/maintenance.py).

Reference analogue: DBRoot redistribution + coarse extent allocation
(writeengine/redistribute/, versioning/BRM/extentmap.cpp) keep the
reference's layout scan-friendly; compaction is the Parquet-lake
equivalent. The invariant under test: compaction changes ONLY the file
layout — never row count, schema, or values.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.sources import maintenance


def _fingerprint(df):
    """Order-insensitive content hash over every row and column."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    return (
        df.select(F.md5(F.concat_ws("\x01", *cols)).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 6), 16, 10).cast("long")))
        .collect()[0][0]
    )


def test_compact_reduces_files_preserves_content(spark, tmp_path):
    dest = str(tmp_path / "frag")
    df = spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )
    # simulate incremental-append fragmentation: 40 tiny files
    df.repartition(40).write.parquet(dest)
    before = maintenance.layout_stats(spark, dest)
    assert before["n_files"] == 40

    fp_before = _fingerprint(spark.read.parquet(dest))
    result = maintenance.compact_table(spark, dest, target_file_mb=128)
    after = maintenance.layout_stats(spark, dest)

    assert result["files_before"] == 40
    assert result["files_after"] == after["n_files"] == 1
    compacted = spark.read.parquet(dest)
    assert compacted.count() == 20_000
    assert _fingerprint(compacted) == fp_before
    # temp dir consumed by the swap
    assert not (tmp_path / "frag_compact_tmp").exists()


def test_compact_cluster_by_restores_pruning_stats(spark, tmp_path):
    dest = str(tmp_path / "clustered")
    df = spark.range(0, 400_000).select(
        (F.col("id") * 37 % 400_000).alias("k"),  # scrambled key
        F.col("id").alias("payload"),
    )
    df.repartition(8).write.parquet(dest)
    maintenance.compact_table(
        spark, dest, target_file_mb=1, cluster_by=["k"]
    )
    files = maintenance.data_files(spark, dest)
    assert len(files) >= 2  # 1 MB target splits the rewrite
    # range-clustered files must have disjoint [min,max] key ranges —
    # that is exactly what makes row-group/file skipping selective
    ranges = []
    for path, _ in files:
        mn, mx = (
            spark.read.parquet(path).agg(F.min("k"), F.max("k")).collect()[0]
        )
        ranges.append((mn, mx))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_compact_materializes_schema_evolution(spark, tmp_path):
    import os

    from mariadb_columnstore_engine_spark.sources import ingest

    dest = str(tmp_path / "evolved")
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v").repartition(
        5
    ).write.parquet(dest)
    ingest.alter_add_column(dest, "flag", "int", 7)
    ingest.alter_drop_column(dest, "v")
    maintenance.compact_table(spark, dest, target_file_mb=128)
    # added/dropped debt settled physically ...
    df = spark.read.parquet(dest)
    assert set(df.columns) == {"id", "flag"}
    assert df.where(F.col("flag") == 7).count() == 1000
    # ... but the DEFAULT persists as column metadata (MariaDB keeps the
    # default after any rewrite) — future INSERT paths read it here
    evo = ingest._evolution(dest)
    assert evo["added"] == [] and evo["dropped"] == []
    assert evo.get("defaults") == {"flag": 7}


def test_compact_preserves_partitioning(spark, tmp_path):
    dest = str(tmp_path / "parted")
    spark.range(0, 5_000).selectExpr(
        "id", "id % 4 AS shard"
    ).repartition(10).write.partitionBy("shard").parquet(dest)
    maintenance.compact_table(
        spark, dest, target_file_mb=128, partition_by=["shard"]
    )
    df = spark.read.parquet(dest)
    assert df.count() == 5_000
    # directory layout survived -> partition pruning still plans
    pruned = df.where(F.col("shard") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan


def test_extent_map_shows_clustered_minmax(spark, tmp_path):
    """cluster_by must yield disjoint per-row-group min/max — the
    casual-partitioning contract, observable without scanning data."""
    from mariadb_columnstore_engine_spark.sources.ingest import write_parquet

    dest = str(tmp_path / "ext")
    df = spark.range(0, 100_000).selectExpr(
        "(id * 37) % 100000 AS k", "id AS payload"
    )
    write_parquet(df.repartition(4), dest, cluster_by=["k"])
    ext = maintenance.extent_map(spark, dest, columns=["k"])
    assert ext and all(e["min"] is not None for e in ext)
    spans = sorted((e["min"], e["max"]) for e in ext)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint → row-group pruning is selective
    assert sum(e["num_rows"] for e in ext) == 100_000


def test_compact_retains_checks_and_generated(spark, tmp_path):
    """Compaction settles only the added/dropped debt. CHECK constraints
    (not materializable) and generated-column expressions (PERSISTENT
    still computes on insert) must survive in a fresh sidecar."""
    from mariadb_columnstore_engine_spark.sources import ingest

    dest = str(tmp_path / "evolved_cg")
    spark.range(0, 100).selectExpr("id", "id * 2.0 AS v").repartition(
        4
    ).write.parquet(dest)
    ingest.alter_add_column(dest, "flag", "int", 7)
    ingest.alter_add_generated_column(dest, "v_sq", "v * v")
    ingest.add_check_constraint(dest, "v_nonneg", "v >= 0")
    maintenance.compact_table(spark, dest, target_file_mb=128)
    # added-column debt settled physically...
    df = spark.read.parquet(dest)
    assert df.where(F.col("flag") == 7).count() == 100
    # ...but checks still enforceable and generated still declarative
    assert [c["name"] for c in ingest.table_checks(dest)] == ["v_nonneg"]
    evo = ingest._evolution(dest)
    assert [g["name"] for g in evo.get("generated", [])] == ["v_sq"]
    # reads still produce the generated column (whether from stored
    # values or the expression) and it tracks v
    got = ingest.read_table_evolved(spark, dest)
    row = got.where(F.col("id") == 3).collect()[0]
    assert row.v_sq == row.v * row.v


def test_extent_eliminate_skips_disjoint_files(spark, tmp_path):
    """TupleBPS extent elimination (tuple-bps.cpp:507-508): files whose
    footer [min,max] cannot overlap the predicate are removed from the
    scan before it is built; survivors + residual filter reproduce the
    full-scan answer exactly."""
    dest = str(tmp_path / "extents")
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    # clustered layout -> disjoint per-file ranges (the prunable shape)
    df.repartitionByRange(10, "k").write.parquet(dest)

    kept, skipped = maintenance.extent_eliminate(
        spark, dest, "k", lo=25_000, hi=34_999
    )
    assert skipped, "clustered ranges must make some files skippable"
    assert len(kept) <= 2  # 10k rows/file -> at most 2 overlapping files

    pruned = maintenance.scan_extent_eliminated(
        spark, dest, "k", lo=25_000, hi=34_999
    )
    full = (
        spark.read.parquet(dest)
        .where((F.col("k") >= 25_000) & (F.col("k") <= 34_999))
    )
    assert pruned.count() == full.count() == 10_000
    assert _fingerprint(pruned) == _fingerprint(full)
    # scan relation really contains only the kept files
    assert sorted(pruned.inputFiles()) == sorted(
        f if f.startswith("file:") else "file://" + f for f in kept
    ) or len(pruned.inputFiles()) == len(kept)


def test_extent_eliminate_open_bounds_and_reused_stats(spark, tmp_path):
    dest = str(tmp_path / "extents2")
    spark.range(0, 10_000).select(F.col("id").alias("k")).repartitionByRange(
        5, "k"
    ).write.parquet(dest)
    stats = maintenance.extent_map(spark, dest, ["k"])
    # one-sided predicate, precomputed (persisted-extent-map) stats path
    kept, skipped = maintenance.extent_eliminate(
        spark, dest, "k", lo=8_000, stats=stats
    )
    # range-partition boundaries are sample-based, so the exact split
    # can shift by one file; the invariant is that most files die and
    # at least one survives
    assert len(skipped) >= 3 and 1 <= len(kept) <= 2
    assert (
        maintenance.scan_extent_eliminated(
            spark, dest, "k", lo=8_000, stats=stats
        ).count()
        == 2_000
    )
    # unknown-range files are conservatively kept: strip stats
    nostats = [dict(e, min=None, max=None) for e in stats]
    kept2, skipped2 = maintenance.extent_eliminate(
        spark, dest, "k", lo=8_000, stats=nostats
    )
    assert skipped2 == [] and len(kept2) == 5


def test_extent_eliminate_all_files_pruned_returns_empty(spark, tmp_path):
    """A fully-out-of-range but valid predicate (lo greater than the
    table max) must return an EMPTY result with the table schema, not
    crash with 'unable to infer schema' from a zero-path parquet read."""
    dest = str(tmp_path / "extents_empty")
    spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(4, "k").write.parquet(dest)

    kept, skipped = maintenance.extent_eliminate(
        spark, dest, "k", lo=10_000_000
    )
    assert kept == [] and len(skipped) == 4
    out = maintenance.scan_extent_eliminated(spark, dest, "k", lo=10_000_000)
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}  # schema preserved


def test_extent_eliminate_respects_disabled_partitions(spark, tmp_path):
    import os

    dest = str(tmp_path / "extents3")
    spark.range(0, 1_000).select(F.col("id").alias("k")).repartitionByRange(
        2, "k"
    ).write.parquet(dest)
    files = sorted(
        f for f in os.listdir(dest) if f.endswith(".parquet")
    )
    maintenance.disable_partitions(dest, [files[0]])
    try:
        kept, skipped = maintenance.extent_eliminate(spark, dest, "k")
        assert files[0] not in {os.path.basename(f) for f in kept + skipped}
    finally:
        maintenance.enable_partitions(dest, [files[0]])


def test_extent_eliminate_string_keys(spark, tmp_path):
    """ctype_extent_*.test / mcol4580-dictionary-extent-elimination:
    extent elimination on a STRING column — footer min/max are byte
    strings, comparable with the same BINARY ordering Spark uses for
    utf8mb4_bin predicates."""
    dest = str(tmp_path / "strext")
    df = spark.range(0, 26_000).select(
        F.concat(
            F.chr(F.lit(65) + (F.col("id") / 1000).cast("int")),
            F.lpad(F.col("id").cast("string"), 6, "0"),
        ).alias("name"),
        F.col("id").alias("v"),
    )
    df.repartitionByRange(13, "name").write.parquet(dest)
    kept, skipped = maintenance.extent_eliminate(
        spark, dest, "name", lo="M", hi="N￿"
    )
    # range-partition boundaries are sample-based: the 2-letter window
    # usually lands in <=2 files but a sampling shift can add one more;
    # the invariant is that MOST files die
    assert skipped and len(kept) <= 3
    got = maintenance.scan_extent_eliminated(
        spark, dest, "name", lo="M", hi="N￿"
    )
    full = spark.read.parquet(dest).where(
        (F.col("name") >= "M") & (F.col("name") <= "N￿")
    )
    assert got.count() == full.count() == 2_000
