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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks."""
    if name == "events":
        # Session-level legacy flag required to decode TIMESTAMP(NANOS).
        # Deliberately NOT restored after the read: SQLConf is consulted at
        # execution time too, so reverting it would break a later collect()
        # of the returned (lazy) DataFrame. The flag only affects parquet
        # nanos columns, which no other fixture table has. Sessions built
        # via session.get_session carry it from ENGINE_CONF already; this
        # runtime set covers vanilla sessions (e.g. the driver's).
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
