"""Parquet-backed table catalog.

Reference analogue: the system catalog (dbcon/execplan/calpontsystemcatalog.h:79,
SYSTABLE/SYSCOLUMN) plus the BRM extent map (versioning/BRM/extentmap.h:127-183)
which stores per-extent min/max for scan pruning. On Spark both jobs are done
by Parquet itself: footers carry the schema, row-group statistics carry the
min/max, and Catalyst prunes files/row groups from pushed predicates.

``load_table`` also owns the one piece of real schema work in the test
fixtures: ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
will not decode natively. With ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as int64 nanoseconds and we rebuild a TIMESTAMP_NTZ with pure
integer arithmetic — timezone-independent, so results match whatever session
timezone the caller runs under.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

#: Tables of the driver fixture set (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables some fixture dirs carry beyond the driver set: the augmented
#: probe fixture (tools/gen_probe_fixture.py) adds the standard TPC-H
#: partsupp table and the reference's SSB star schema (lineorder +
#: dateinfo, include/ssb/createTables.inc) so reference MTR statements
#: over them become checkable. Registered only when the parquet file
#: exists in the fixture dir.
OPTIONAL_TABLES: tuple[str, ...] = ("partsupp", "lineorder", "dateinfo")

# TIMESTAMP_NTZ '1970-01-01' + exact integer day/microsecond arithmetic.
# (ts div 1000) truncates nanos -> micros exactly like DuckDB's
# TIMESTAMP_NS -> TIMESTAMP coercion, keeping the oracle bit-identical.
_TS_NTZ_FROM_NANOS = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
    "CAST((ts div 1000) div 86400000000 AS INT), 0, 0, "
    "CAST((ts div 1000) % 86400000000 AS DOUBLE) / 1e6)"
)


def _stat_key(path: str):
    """(size, mtime_ns) staleness fingerprint for a single-file table,
    or None when the path is a directory / missing (never cached)."""
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isfile(path):
        return None
    return (st.st_size, st.st_mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks.

    Plan-metadata reuse (NOT data caching): the reference engine keeps
    table/column metadata in its system catalog and never re-reads it
    per statement (dbcon/execplan/calpontsystemcatalog.h SYSTABLE /
    SYSCOLUMN); re-creating the DataFrame on every query forces Spark
    to re-infer the parquet schema from the footer each time (~0.2 s
    of driver-side work per table, measured r12 — it dominated the
    sub-second bench queries). Cache the LAZY DataFrame per session,
    fingerprinted by (size, mtime_ns) so any rewrite of the fixture
    file invalidates the entry. The DataFrame holds no rows — every
    execution still scans the parquet input."""
    key = (sf_dir.rstrip("/"), name)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    stat = _stat_key(path)
    cache = getattr(spark, "_mcs_plan_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._mcs_plan_cache = cache
        except AttributeError:  # frozen session wrapper — skip caching
            cache = None
    if cache is not None and stat is not None:
        hit = cache.get(key)
        if hit is not None and hit[0] == stat:
            if name == "events":
                # The cached lazy DataFrame decodes TIMESTAMP(NANOS)
                # only while the session conf holds; _read_table set it
                # on the miss, but anything may have reset it since —
                # re-assert on every hit (cheap conf get) so execution
                # of the cached plan cannot misdecode (ADVICE r12).
                _ensure_nanos_conf(spark)
            return hit[1]
    df = _read_table(spark, sf_dir, name)
    if cache is not None and stat is not None:
        cache[key] = (stat, df)
    return df


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Session-level legacy flag required to decode TIMESTAMP(NANOS).
    Deliberately NOT restored after the read: SQLConf is consulted at
    execution time too, so reverting it would break a later collect()
    of the returned (lazy) DataFrame. The flag only affects parquet
    nanos columns, which no other fixture table has. Sessions built
    via session.get_session carry it from ENGINE_CONF already; this
    runtime set covers vanilla sessions (e.g. the driver's)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        _ensure_nanos_conf(spark)
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_TS_NTZ_FROM_NANOS))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Catalog:
    """Lazy table access: ``Catalog(spark, sf_dir).lineitem`` → DataFrame.

    DataFrames are cached per instance (plan reuse, not data caching).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLES and name not in OPTIONAL_TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def optional_tables_present(self) -> tuple[str, ...]:
        """OPTIONAL_TABLES whose parquet exists in this fixture dir."""
        import os

        return tuple(
            t for t in OPTIONAL_TABLES
            if os.path.exists(f"{self._sf_dir}/{t}.parquet")
        )

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self.table(name)

    def register_views(self, names: tuple[str, ...] | None = None) -> None:
        """Register temp views so ``spark.sql`` sees the catalog (the
        reference's pushed-down-SQL entry point, SURVEY §3). Default set
        is the driver tables plus any optional tables present."""
        if names is None:
            names = TABLES + self.optional_tables_present()
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def tables_referenced(self, sql: str) -> tuple[str, ...]:
        """Catalog tables whose names appear as identifier tokens in
        ``sql`` (word-boundary match — a table name inside another
        identifier like ``l_partkey`` never matches). Falls back to the
        full set when nothing matches, so a FROM-less statement still
        gets a complete namespace."""
        import re

        known = TABLES + self.optional_tables_present()
        hit = tuple(
            t for t in known
            if re.search(rf"\b{t}\b", sql, re.IGNORECASE)
        )
        return hit or known

    def numeric_columns(self, names: tuple[str, ...]) -> frozenset[str]:
        """Lowercase names of int/bigint/short/byte/double/decimal
        columns across ``names`` — the statically-safe operand set for
        the dialect layer's direct loose-cast parse (sqltrans r12 fast
        path). FLOAT columns are deliberately excluded: their widening
        to double drifts from their string render, so they stay on the
        proven CAST-to-string path."""
        from pyspark.sql.types import (
            ByteType,
            DecimalType,
            DoubleType,
            IntegerType,
            LongType,
            ShortType,
        )

        numeric = (
            ByteType, ShortType, IntegerType, LongType, DoubleType,
            DecimalType,
        )
        cols: set[str] = set()
        other: set[str] = set()
        for t in names:
            for f in self.table(t).schema.fields:
                (cols if isinstance(f.dataType, numeric) else other).add(
                    f.name.lower()
                )
        # a name that is numeric in one table but not in another is
        # ambiguous — keep it on the slow path
        return frozenset(cols - other)

    def register_views_for(self, sql: str) -> None:
        """Register only the views ``sql`` references — per-statement
        view registration costs ~13 ms/view (measured r12), so the
        front-end paths that re-register per call should not pay for
        the 10-table namespace when the statement touches one table."""
        self.register_views(self.tables_referenced(sql))
