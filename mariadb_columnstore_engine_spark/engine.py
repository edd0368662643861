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
        self._register_persisted_views()

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "mcs-spark-engine",
              **session_kwargs) -> "Engine":
        return cls(get_session(app_name, **session_kwargs), sf_dir)

    def sql(self, query: str, *, dialect: str = "mariadb") -> DataFrame:
        """Run SQL over the registered tables (+ engine UDFs).

        ``dialect="mariadb"`` (default) first rewrites MariaDB-isms Spark
        spells differently (GROUP_CONCAT, LIMIT offset-comma, %-format
        patterns, # comments — functions/sqltrans.py); ANSI statements
        pass through unchanged. ``dialect="spark"`` skips the pass.
        """
        if dialect == "mariadb":
            from mariadb_columnstore_engine_spark.functions.sqltrans import (
                translate_statement,
            )

            query = translate_statement(query)
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

    # --- views (server-side CREATE VIEW analogue) ---

    def create_view(self, name: str, sql: str, *, persist: bool = False
                    ) -> None:
        """CREATE [OR REPLACE] VIEW: the text is analyzed immediately
        (errors surface at definition time, as in the server) and
        registered as a temp view over the engine's tables. With
        ``persist=True`` the definition is also recorded in the
        warehouse's ``_views.json`` and re-registered by every future
        Engine over the same directory — the durable-metadata model a
        lakehouse table format uses for view text."""
        self.sql(sql).createOrReplaceTempView(name)
        if persist:
            import json
            import os

            p = os.path.join(self.catalog._sf_dir, "_views.json")
            views = {}
            if os.path.exists(p):
                with open(p) as f:
                    views = json.load(f)
            views[name] = sql
            with open(p, "w") as f:
                json.dump(views, f, indent=1)

    def drop_view(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        import json
        import os

        p = os.path.join(self.catalog._sf_dir, "_views.json")
        if os.path.exists(p):
            with open(p) as f:
                views = json.load(f)
            if name in views:
                del views[name]
                with open(p, "w") as f:
                    json.dump(views, f, indent=1)

    def _register_persisted_views(self) -> None:
        import json
        import os

        p = os.path.join(self.catalog._sf_dir, "_views.json")
        if os.path.exists(p):
            with open(p) as f:
                for name, sql in json.load(f).items():
                    self.sql(sql).createOrReplaceTempView(name)

    def describe(self, name: str) -> list[tuple[str, str]]:
        """DESCRIBE <table|view>: (column, type) pairs."""
        return [(f.name, f.dataType.simpleString())
                for f in self.spark.table(name).schema.fields]
