"""Query registry: the executable inventory of SURVEY.md §2.

Every implemented operator/capability is registered here as a named pair:

- a PySpark plan builder ``fn(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL string the DuckDB oracle runs over the same
  parquet files (``None`` for ops SQL cannot express → the driver records
  a weaker rows-only check).

This registry is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the verification driver, what ``bench.py`` samples, and what the
pytest parity suite iterates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    section: str  # SURVEY.md §2 anchor this query evidences
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, *, oracle: str | None, section: str, bench: bool = False):
    """Decorator registering a query plan + its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, section, bench)
        return fn

    return deco


def sql_query(name: str, sql: str, *, section: str, bench: bool = False) -> None:
    """Register a query whose Spark plan IS the oracle SQL, executed through
    ``spark.sql`` over registered temp views.

    This is the reference's main entry point — SQL text pushed down whole
    (dbcon/mysql/ha_mcs_pushdown.cpp:762 create_columnstore_select_handler)
    — so running the identical statement through Spark's parser/analyzer
    and through DuckDB checks the full SQL front end, not just DataFrame
    plan construction. Only the ANSI subset both engines parse identically
    is used in these strings.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mariadb_columnstore_engine_spark.catalog import Catalog

        Catalog(spark, sf_dir).register_views()
        return spark.sql(sql)

    fn.__name__ = f"sql_{name}"
    QUERIES[name] = QuerySpec(name, fn, sql, section, bench)


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module (each registers its queries on import)."""
    from mariadb_columnstore_engine_spark.plans import (  # noqa: F401
        tpch,
        filters,
        joins,
        aggregates,
        windows,
        setops,
        scalar_funcs,
        subqueries,
        events_plans,
        text_plans,
        similarity_plans,
        udf_plans,
    )

    return QUERIES
