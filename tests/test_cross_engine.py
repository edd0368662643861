"""CrossEngineStep analogue: JDBC foreign source joined with native tables.

Reference analogue: CrossEngineStep scans a foreign-engine (InnoDB) table
over the MySQL client protocol inside a ColumnStore query
(dbcon/joblist/crossenginestep.h:53). Here the foreign engine is
embedded Derby (in the Spark JVM — no external server needed), read via
``sources.ingest.read_jdbc``, which also exercises the partitioned
parallel scan path (the JDBC equivalent of fanning extent scans across
PMs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mariadb_columnstore_engine_spark.sources.ingest import read_jdbc

_URL = "jdbc:derby:memory:crosseng"
_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(_URL + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE region_meta "
        "(r_regionkey INT PRIMARY KEY, tier VARCHAR(10), weight DOUBLE)"
    )
    for k, tier, w in [
        (0, "core", 1.0),
        (1, "core", 0.8),
        (2, "growth", 0.5),
        (3, "growth", 0.4),
        (4, "frontier", 0.2),
    ]:
        st.execute(
            f"INSERT INTO region_meta VALUES ({k}, '{tier}', {w})"
        )
    conn.commit()
    yield _URL
    try:
        jvm.java.sql.DriverManager.getConnection(
            _URL + ";drop=true"
        )
    except Exception:
        pass  # Derby signals successful in-memory drop via SQLException


def test_jdbc_scan_and_filter(spark, derby):
    df = read_jdbc(spark, derby, "region_meta", properties=_PROPS)
    assert df.count() == 5
    got = df.where(F.col("tier") == "core").count()
    assert got == 2


def test_jdbc_partitioned_parallel_scan(spark, derby):
    df = read_jdbc(
        spark,
        derby,
        "region_meta",
        partition_column="r_regionkey",
        lower_bound=0,
        upper_bound=5,
        num_partitions=3,
        properties=_PROPS,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5


def test_cross_engine_join_with_native_table(spark, sf_dir, derby):
    """The CrossEngineStep shape: foreign dim × native fact in one plan."""
    from mariadb_columnstore_engine_spark.catalog import Catalog

    t = Catalog(spark, sf_dir)
    meta = read_jdbc(spark, derby, "region_meta", properties=_PROPS)
    joined = (
        t.region.join(
            F.broadcast(meta),
            t.region.r_regionkey == meta.R_REGIONKEY,
        )
        .groupBy("TIER")
        .agg(F.count(F.lit(1)).alias("n_regions"))
        .orderBy("TIER")
    )
    rows = {r.TIER: r.n_regions for r in joined.collect()}
    assert rows == {"core": 2, "frontier": 1, "growth": 2}


def test_jdbc_query_pushdown_form(spark, derby):
    """SELECT-text sources push the whole statement to the foreign engine
    (the reference's CrossEngineStep likewise sends full SQL)."""
    df = read_jdbc(
        spark,
        derby,
        "SELECT tier, sum(weight) AS total_w FROM region_meta GROUP BY tier",
        properties=_PROPS,
    )
    got = {r.TIER: r.TOTAL_W for r in df.collect()}
    assert got == {"core": 1.8, "growth": 0.9, "frontier": 0.2}


def test_jdbc_write_roundtrip(spark, derby):
    from mariadb_columnstore_engine_spark.sources.ingest import write_jdbc

    out = spark.range(0, 50).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2.0).alias("v"),
    )
    # single connection to the embedded DB; a real server takes more
    write_jdbc(out.repartition(1), derby, "pushed_back", properties=_PROPS)
    back = read_jdbc(spark, derby, "pushed_back", properties=_PROPS)
    assert back.count() == 50
    assert back.agg(F.sum("V")).collect()[0][0] == sum(i * 2.0 for i in range(50))
