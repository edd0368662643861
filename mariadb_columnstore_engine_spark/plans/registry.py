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
    )

    return QUERIES
