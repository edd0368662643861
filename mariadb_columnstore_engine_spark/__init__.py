"""PySpark-native analytics engine with the query surface of
mariadb-corporation/mariadb-columnstore-engine.

The reference is an MPP columnar OLAP engine (see /root/reference and
SURVEY.md). This package re-expresses its capabilities Spark-first:

- ``session``  — tuned SparkSession factory (ExeMgr/ResourceManager analogue:
  AQE, CBO, broadcast thresholds instead of joblist resource tuning).
- ``catalog``  — Parquet-backed table catalog (system catalog + extent map
  analogue: Parquet footers/row-group stats replace the BRM extent map).
- ``functions`` — MariaDB-dialect function layer over pyspark.sql.functions
  (reference: utils/funcexp/funcexp.cpp dispatch table).
- ``operators`` — composed operators Spark lacks natively (dedup/minhash,
  similarity search, text analysis, event-time sessionization).
- ``plans``    — the query inventory: every SURVEY.md §2 operator expressed
  as a (PySpark DataFrame plan, ANSI-SQL oracle) pair.
- ``sources``  — ingestion (cpimport analogue) and foreign-engine access
  (CrossEngineStep analogue via JDBC).
- ``streaming`` — Structured Streaming variants of the event operators
  (beyond reference surface: the reference is batch-only, SURVEY §2.10).
"""

from mariadb_columnstore_engine_spark.session import get_session, configure
from mariadb_columnstore_engine_spark.catalog import Catalog, load_table, TABLES

__all__ = ["get_session", "configure", "Catalog", "load_table", "TABLES"]
__version__ = "0.1.0"
