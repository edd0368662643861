"""Multi-version table: snapshot reads, rollback, time travel, vacuum.

Reference analogue: ColumnStore's BRM version buffer — every DML writes
new blocks while the VSS/VBBM structures keep the pre-image so readers
hold a consistent snapshot and ROLLBACK restores it (versioning/BRM/
dbrm.h:164-199; dbcon/dmlpackageproc rollback paths). A columnar engine
on immutable files gets the same guarantees from versioned directories
plus an atomic current-version pointer — the manifest model Delta Lake /
Iceberg formalize; this is the minimal self-contained form of it.

Layout::

    <root>/v=1/part-*.parquet
    <root>/v=2/part-*.parquet
    <root>/_current            # text file: the committed version number

Commit protocol: data is fully written to ``v=N`` BEFORE the pointer
flips, and the pointer flip is a same-filesystem rename — readers see
either the old or the new version, never a partial write. On an object
store, swap the rename for the table format's log commit; everything
else is unchanged.

Scale notes: versions share nothing (full copy) — right for fixture
scale and for full-table rewrites; partial-update workloads at 100 TB
want file-level manifests (only rewritten files are new) — the interface
(read(version)/rollback/vacuum) is the stable part, the storage of a
version is the swappable part.
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

_POINTER = "_current"


class VersionedTable:
    """A parquet table with numbered, immutable versions."""

    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")

    # ---- version bookkeeping -------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_version(self) -> int:
        """The committed version, or 0 if the table doesn't exist."""
        try:
            with open(self._pointer_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def versions(self) -> list[int]:
        """All retained version numbers (ascending)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v="):
                out.append(int(name[2:]))
        return sorted(out)

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def _commit(self, version: int) -> None:
        """Atomically flip the current-version pointer."""
        tmp = os.path.join(self.root, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer_path())

    # ---- write paths ---------------------------------------------
    def write(self, df: DataFrame) -> int:
        """Append a new version containing ``df``; returns its number."""
        os.makedirs(self.root, exist_ok=True)
        version = max(self.versions(), default=0) + 1
        df.write.parquet(self._version_dir(version))
        self._commit(version)
        return version

    def update_where(
        self,
        spark: SparkSession,
        predicate: Column,
        assignments: dict[str, Column],
    ) -> int:
        """Copy-on-write UPDATE into a NEW version (the pre-image
        version is retained — that's what makes rollback possible).
        NULL-predicate rows are untouched, matching SQL UPDATE."""
        df = self.read(spark)
        hit = F.coalesce(predicate, F.lit(False))
        updated = df.select(
            *[
                F.when(hit, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in df.columns
            ]
        )
        return self.write(updated)

    def delete_where(self, spark: SparkSession, predicate: Column) -> int:
        """Copy-on-write DELETE into a new version. Only predicate=TRUE
        rows are removed (NULL keeps the row, matching SQL DELETE)."""
        df = self.read(spark)
        return self.write(df.where(~F.coalesce(predicate, F.lit(False))))

    # ---- read / restore ------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the committed version (default) or time-travel to any
        retained ``version``."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"no committed version at {self.root}")
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version} not retained at {self.root} "
                f"(have {self.versions()})"
            )
        return spark.read.parquet(self._version_dir(v))

    def rollback(self, to_version: int) -> None:
        """ROLLBACK: point the table back at an older retained version.
        Later versions stay on disk until vacuum()."""
        if to_version not in self.versions():
            raise ValueError(
                f"cannot roll back to missing version {to_version} "
                f"(have {self.versions()})"
            )
        self._commit(to_version)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (never the
        committed one). Returns the versions removed. ≈ the reference's
        version-buffer cleanup once no transaction can see a pre-image."""
        import shutil

        keep_last = max(keep_last, 1)
        current = self.current_version()
        retained = self.versions()
        keep = set(retained[-keep_last:]) | {current}
        removed = []
        for v in retained:
            if v not in keep:
                shutil.rmtree(self._version_dir(v))
                removed.append(v)
        return removed
