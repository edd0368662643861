"""User-facing engine facade — the single object a reference user adopts.

Reference analogue: connecting to mysqld with the ColumnStore plugin
loaded (SQL in → results out, dbcon/mysql/ha_mcs_pushdown.cpp:762). Here:

    from mariadb_columnstore_engine_spark.engine import Engine
    eng = Engine.local(sf_dir="/data/warehouse")
    eng.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
    eng.table("orders").where(...)         # DataFrame surface
    eng.analyze("lineitem")                # CBO stats (ANALYZE plan)

Bundles: tuned session (session.py), parquet catalog + temp views
(catalog.py), the MariaDB-dialect UDF registrations (functions/udf.py),
and ingest/DML helpers (sources/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import TABLES, Catalog
from mariadb_columnstore_engine_spark.functions.udf import register_all
from mariadb_columnstore_engine_spark.session import get_session


class Engine:
    """SQL + DataFrame entry point over a directory of parquet tables."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.catalog = Catalog(spark, sf_dir)
        self.catalog.register_views()
        register_all(spark)

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "mcs-spark-engine",
              **session_kwargs) -> "Engine":
        return cls(get_session(app_name, **session_kwargs), sf_dir)

    def sql(self, query: str) -> DataFrame:
        """Run SQL over the registered tables (+ engine UDFs)."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def analyze(self, name: str, columns: list[str] | None = None) -> None:
        """Compute CBO statistics for a (catalog) table — see
        sources.ingest.analyze_table for the temp-view caveat."""
        from mariadb_columnstore_engine_spark.sources.ingest import (
            analyze_table,
        )

        analyze_table(self.spark, name, columns)

    def explain(self, query: str) -> str:
        """Formatted physical plan for a SQL statement."""
        df = self.sql(query)
        mode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode
        return df._jdf.queryExecution().explainString(
            mode.fromString("formatted")
        )
