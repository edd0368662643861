"""Aggregate-fuzz parity: randomized tables with NULL-able group keys
and values must aggregate identically in Spark and DuckDB (§2.4).

Axes the generator exercises: NULL group keys (SQL groups them
together), NULL values (skipped by every aggregate except COUNT(*)),
empty groups vs empty input (global aggregate over zero rows still
yields one row), duplicate keys, and DISTINCT aggregation. Sums run on
integers so cross-engine float summation order cannot matter — DuckDB's
HUGEINT sum is cast back to BIGINT (the round-2 wire-type lesson).
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 3)),  # group key (NULL-able)
    st.one_of(st.none(), st.integers(-50, 50)),  # value (NULL-able)
)
_table = st.lists(_row, min_size=0, max_size=16)

_AGG_SQL = (
    "count(*) AS n_rows, count(v) AS n_vals, "
    "CAST(sum(v) AS BIGINT) AS sum_v, min(v) AS min_v, max(v) AS max_v, "
    "count(DISTINCT v) AS n_distinct, "
    "CAST(sum(DISTINCT v) AS BIGINT) AS sum_distinct"
)


def _duck(rows, grouped):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INTEGER, v INTEGER)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    if grouped:
        q = f"SELECT k, {_AGG_SQL} FROM t GROUP BY k"
    else:
        q = f"SELECT {_AGG_SQL} FROM t"
    got = con.execute(q).fetchall()
    con.close()
    return sorted(got, key=repr)


def _spark(spark, rows, grouped):
    df = spark.createDataFrame(rows, "k int, v int") if rows else (
        spark.createDataFrame([], "k int, v int")
    )
    df.createOrReplaceTempView("fa_t")
    if grouped:
        q = f"SELECT k, {_AGG_SQL} FROM fa_t GROUP BY k"
    else:
        q = f"SELECT {_AGG_SQL} FROM fa_t"
    return sorted((tuple(r) for r in spark.sql(q).collect()), key=repr)


@given(rows=_table)
@settings(**_SETTINGS)
def test_grouped_aggregates_match_duckdb(spark, rows):
    assert _spark(spark, rows, True) == _duck(rows, True), rows


@given(rows=_table)
@settings(**_SETTINGS)
def test_global_aggregates_match_duckdb(spark, rows):
    # includes the zero-row case: one output row, NULL aggregates,
    # count()=0 — the classic scalar-aggregate edge
    assert _spark(spark, rows, False) == _duck(rows, False), rows
