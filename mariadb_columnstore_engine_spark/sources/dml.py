"""Row DML (UPDATE / DELETE) as copy-on-write over Parquet.

Reference analogue: DMLProc's UPDATE/DELETE processors with the MVCC
version buffer for rollback (dbcon/dmlpackageproc/updatepackageprocessor
.cpp, deletepackageprocessor.cpp; VSS lookup versioning/BRM/dbrm.h:
164-199). A batch columnar engine on Parquet has no in-place row
mutation, so DML is copy-on-write: read → transform → write-new → swap —
the same model Delta/Iceberg implement with manifest atomicity. Here the
swap is a directory rename (atomic on a single POSIX filesystem; on
object stores you would layer a table format for the commit protocol —
the transform logic is unchanged).

Scale notes: the rewrite is a full scan + write of affected data only if
you partition wisely — pass ``partition_filter`` to rewrite only the
hive partitions that can contain matches (partition pruning bounds the
copy-on-write cost exactly like the reference's extent-targeted DML).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession


def _as_bool(predicate: Column) -> Column:
    """SQL three-valued predicate → two-valued row selector.

    A WHERE predicate that evaluates to NULL selects nothing, but
    ``df.where(~predicate)`` also drops NULL rows — so an ungated
    complement split loses NULL-predicate rows from BOTH branches.
    Coalescing to FALSE makes the TRUE/complement split exhaustive.
    """
    import pyspark.sql.functions as F

    return F.coalesce(predicate, F.lit(False))


def _rewrite(spark: SparkSession, path: str,
             transform, partition_filter: Column | None,
             alias: str | None = None) -> int:
    """Common copy-on-write machinery; returns the new row count.

    Reads through the schema-evolution sidecar (read_table_evolved), so
    transforms see the LOGICAL schema — instant-ALTER-added and generated
    columns included — and the rewrite materializes that debt into the
    new files (same settlement compact_table performs). The sidecar's
    non-materializable state — CHECK constraints and generated-column
    expressions (MariaDB PERSISTENT still computes on every insert) —
    survives the swap; only 'added'/'dropped' entries are consumed.
    """
    import pyspark.sql.functions as F

    from mariadb_columnstore_engine_spark.sources.ingest import (
        _evolution,
        _write_evolution,
        read_table_evolved,
    )

    evo = _evolution(path)
    if evo.get("disabled_partitions") and (
        evo.get("added") or evo.get("dropped")
        or evo.get("renamed") or evo.get("retyped")
    ):
        # the rewrite would materialize instant-ALTER debt for enabled
        # files only, leaving disabled files with a schema the consumed
        # sidecar can no longer describe — same reason the reference
        # blocks DDL/DML interplay with disabled partitions
        raise ValueError(
            "table has disabled partitions AND pending instant-ALTER "
            "debt; calenablepartitions first, then rerun the DML"
        )
    df = read_table_evolved(spark, path)
    if alias:
        # correlated subqueries in predicates (WHERE EXISTS (... WHERE
        # x = t.col)) need the target relation addressable by its table
        # name, exactly as the SQL text spells it
        df = df.alias(alias)
    if partition_filter is not None:
        untouched = df.where(~_as_bool(partition_filter))
        scoped = df.where(_as_bool(partition_filter))
    else:
        untouched = None
        scoped = df
    out = transform(scoped)
    if untouched is not None:
        out = out.unionByName(untouched)
    # PERSISTENT generated-column semantics: recompute from the (possibly
    # updated) base columns — a stored stale value must not survive an
    # UPDATE of its inputs
    for g in evo.get("generated", []):
        out = out.withColumn(g["name"], F.expr(g["expr"]))
    tmp = f"{path.rstrip('/')}__cow_{uuid.uuid4().hex[:8]}"
    from mariadb_columnstore_engine_spark.sources.ingest import (
        strip_collations,
    )

    out = strip_collations(out)
    out.write.parquet(tmp)
    n = spark.read.parquet(tmp).count()  # visible rows (pre-carry)
    # disabled partitions are invisible to queries AND to DML (the
    # reference blocks DML/import on them) — read_table_evolved excluded
    # their files above, so carry them through the swap byte-wise or the
    # copy-on-write would silently destroy them
    disabled = set(evo.get("disabled_partitions", []))
    if disabled:
        from mariadb_columnstore_engine_spark.sources.ingest import (
            _live_data_files,
        )

        for f in _live_data_files(path, set()):
            name = os.path.basename(f)
            if name in disabled:
                rel = os.path.relpath(f, path)
                dst = os.path.join(tmp, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(f, dst)
    old = f"{tmp}__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # an ALTER-ADD default keeps applying to FUTURE inserts after the
    # column itself is materialized (MariaDB: the default is column
    # metadata, not backfill) — migrate it into the 'defaults' map
    surviving_defaults = {
        c["name"]: c["default"]
        for c in evo.get("added", [])
        if c.get("default") is not None
    }
    surviving_defaults.update(evo.get("defaults", {}))
    # renames are materialized by this rewrite (files now carry the new
    # names) — re-key any default that referenced the old spelling
    for r in evo.get("renamed", []):
        if r["from"] in surviving_defaults:
            surviving_defaults[r["to"]] = surviving_defaults.pop(r["from"])
    surviving = {
        "added": [],
        "dropped": [],
        "generated": evo.get("generated", []),
        "checks": evo.get("checks", []),
        "defaults": surviving_defaults,
    }
    # the AUTO_INCREMENT counter (BRM autoincrement-manager analogue) is
    # pure metadata — a rewrite must not reset the sequence
    if evo.get("autoinc"):
        surviving["autoinc"] = evo["autoinc"]
    if disabled:
        surviving["disabled_partitions"] = sorted(disabled)
    if any((surviving["generated"], surviving["checks"],
            surviving["defaults"], surviving.get("autoinc"),
            surviving.get("disabled_partitions"))):
        _write_evolution(path, surviving)
    # the swapped directory invalidates any cached file listing
    spark.catalog.clearCache()
    return n


def delete_where(spark: SparkSession, path: str, predicate: Column,
                 *, partition_filter: Column | None = None,
                 alias: str | None = None) -> int:
    """DELETE FROM <path> WHERE predicate (copy-on-write).

    SQL DELETE removes only predicate=TRUE rows; rows where the predicate
    is NULL (e.g. ``col = x`` on a NULL col) are KEPT.
    """
    return _rewrite(
        spark, path, lambda df: df.where(~_as_bool(predicate)),
        partition_filter, alias,
    )


def update_where(
    spark: SparkSession,
    path: str,
    predicate: Column,
    assignments: dict[str, Column],
    *,
    partition_filter: Column | None = None,
    alias: str | None = None,
) -> int:
    """UPDATE <path> SET col=expr, ... WHERE predicate (copy-on-write).

    ``assignments`` maps column name → new-value expression; non-matching
    rows keep their values (CASE WHEN predicate THEN new ELSE old END).
    """
    import pyspark.sql.functions as F

    def transform(df: DataFrame) -> DataFrame:
        out = df
        for col_name, new_val in assignments.items():
            out = out.withColumn(
                col_name,
                F.when(predicate, new_val).otherwise(F.col(col_name)),
            )
        return out

    return _rewrite(spark, path, transform, partition_filter, alias)


def _require_unique_keys(new_rows: DataFrame, keys: list[str],
                         what: str) -> None:
    # MariaDB applies multi-row upserts sequentially (last write wins
    # row-by-row); a distributed engine has no row order, so demand
    # key-unique input instead of silently picking a winner
    n, nd = new_rows.select(
        *(keys)
    ).count(), new_rows.select(*keys).distinct().count()
    if n != nd:
        raise ValueError(
            f"{what}: new_rows contain {n - nd} duplicate key tuples over "
            f"{keys}; dedupe first — sequential last-write-wins is not "
            "reproducible on a distributed engine"
        )


def replace_into(spark: SparkSession, path: str, new_rows: DataFrame,
                 keys: list[str]) -> int:
    """MariaDB REPLACE INTO (copy-on-write): any existing row sharing a
    new row's key tuple is deleted, then the new rows are inserted —
    delete-then-insert, the documented REPLACE algorithm (the reference
    routes it through DMLProc delete+insert packages the same way)."""
    _require_unique_keys(new_rows, keys, "replace_into")

    def transform(df: DataFrame) -> DataFrame:
        kept = df.join(new_rows.select(*keys), keys, "left_anti")
        return kept.unionByName(new_rows.select(*df.columns))

    return _rewrite(spark, path, transform, None)


def upsert_into(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    keys: list[str],
    *,
    update_cols: list[str] | None = None,
) -> int:
    """MariaDB INSERT ... ON DUPLICATE KEY UPDATE (copy-on-write):
    existing rows matching a new row's key get ``update_cols`` (default:
    every non-key column) overwritten from the new row; new rows with
    unmatched keys are appended. Unlike REPLACE, untouched columns of a
    matched row SURVIVE — the semantic difference the two statements
    exist to express.

    ``update_cols`` entries are plain column names (take the new value)
    or ``(col, expr_sql)`` tuples for general update expressions
    (dml.y update_expr): ``expr_sql`` may reference the existing row's
    columns by name and the incoming row's values as ``_new_<col>``
    (e.g. ``c = c + VALUES(c)`` arrives as ``("c", "c + _new_c")``).
    Assignments apply left to right and later expressions see earlier
    assignments' results — MariaDB's documented evaluation order."""
    import pyspark.sql.functions as F

    _require_unique_keys(new_rows, keys, "upsert_into")

    def transform(df: DataFrame) -> DataFrame:
        entries = update_cols or [
            c for c in new_rows.columns if c not in keys
        ]
        # every inserted non-key value rides the join as _new_<col>: a
        # general expression may reference VALUES(x) of ANY column, not
        # just its own assignment target
        carry = [c for c in new_rows.columns if c not in keys]
        marked = new_rows.select(
            *keys,
            F.lit(True).alias("_upd"),
            *[F.col(c).alias(f"_new_{c}") for c in carry],
        )
        out = df.join(marked, keys, "left")
        for entry in entries:
            if isinstance(entry, tuple):
                c, expr_sql = entry
                newval = F.expr(expr_sql)
            else:
                c, newval = entry, F.col(f"_new_{entry}")
            out = out.withColumn(
                c,
                F.when(F.col("_upd"), newval).otherwise(F.col(c)),
            )
        out = out.select(*df.columns)
        appended = new_rows.join(df.select(*keys), keys, "left_anti")
        return out.unionByName(appended.select(*df.columns))

    return _rewrite(spark, path, transform, None)


def snapshot_tree(src: str, dst: str) -> None:
    """Cheap pre-image snapshot of a table directory for transaction
    rollback (reference analogue: the BRM version buffer keeping block
    pre-images for ROLLBACK — versioning/BRM/dbrm.h:164-199,
    dbcon/dmlpackageproc rollback paths).

    Data files (.parquet/.orc) are HARDLINKED, not copied — the engine
    never modifies them in place (copy-on-write DML unlinks and replaces
    whole directories), so a link is a zero-copy pre-image, the same
    trick the version buffer plays with block references. Small metadata
    files (the evolution sidecar, _SUCCESS markers) ARE copied byte-wise:
    the sidecar is rewritten in place via open('w'), which would corrupt
    a shared inode. On an object store, swap this for the table-format
    snapshot (VersionedTable is the manifest-shaped sibling).
    """
    import shutil

    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(troot, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(troot, f)
            if f.endswith((".parquet", ".orc")):
                try:
                    os.link(s, d)
                    continue
                except OSError:
                    pass  # cross-device etc. — fall through to copy
            shutil.copy2(s, d)
