"""Join-fuzz parity: randomized small tables with NULL-able keys must
join identically in Spark and DuckDB across every join type (§2.3).

The generator produces two keyed tables with controlled NULL density and
duplicate keys (the two classic join-bug axes: NULL keys never match in
equi-joins; duplicates multiply). Both engines run semantically identical
plans built from their native operators (DataFrame API vs SQL), and the
sorted result bags must match exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# key domain deliberately tiny so duplicates and misses both occur
_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 5)),  # key (NULL-able)
    st.integers(0, 100),  # payload
)
_table = st.lists(_row, min_size=0, max_size=12)

JOIN_TYPES = [
    ("inner", "INNER JOIN"),
    ("left", "LEFT JOIN"),
    ("right", "RIGHT JOIN"),
    ("full", "FULL JOIN"),
    ("left_semi", "SEMI JOIN"),
    ("left_anti", "ANTI JOIN"),
]


def _duck_join(left, right, sql_kind):
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE r(k INTEGER, b INTEGER)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left or [(None, 0)])
    if not left:
        con.execute("DELETE FROM l")
    con.executemany("INSERT INTO r VALUES (?, ?)", right or [(None, 0)])
    if not right:
        con.execute("DELETE FROM r")
    if sql_kind in ("SEMI JOIN", "ANTI JOIN"):
        q = f"SELECT l.k, l.a FROM l {sql_kind} r ON l.k = r.k"
    else:
        q = (
            f"SELECT l.k AS lk, l.a, r.k AS rk, r.b "
            f"FROM l {sql_kind} r ON l.k = r.k"
        )
    rows = con.execute(q).fetchall()
    con.close()
    return sorted(rows, key=repr)


@given(left=_table, right=_table, jt=st.sampled_from(JOIN_TYPES))
@settings(**_SETTINGS)
def test_join_types_match_duckdb(spark, left, right, jt):
    spark_kind, sql_kind = jt
    ldf = spark.createDataFrame(left, "k int, a int")
    rdf = spark.createDataFrame(right, "k int, b int")
    joined = ldf.join(rdf, ldf.k == rdf.k, spark_kind)
    if spark_kind in ("left_semi", "left_anti"):
        got = sorted(
            [(r.k, r.a) for r in joined.collect()], key=repr
        )
    else:
        got = sorted(
            [tuple(r) for r in joined.collect()], key=repr
        )
    expected = _duck_join(left, right, sql_kind)
    assert got == expected, (spark_kind, left, right)


@given(left=_table, right=_table)
@settings(**_SETTINGS)
def test_null_aware_not_in_matches_duckdb(spark, left, right):
    """NOT IN with a NULL in the subquery result selects NOTHING — the
    §2.9 null-trap (jlf_subquery.cpp:287 handleNotIn MATCHNULLS)."""
    ldf = spark.createDataFrame(left, "k int, a int")
    rdf = spark.createDataFrame(right, "k int, b int")
    ldf.createOrReplaceTempView("fj_l")
    rdf.createOrReplaceTempView("fj_r")
    got = sorted(
        (
            tuple(r)
            for r in spark.sql(
                "SELECT k, a FROM fj_l WHERE k NOT IN (SELECT k FROM fj_r)"
            ).collect()
        ),
        key=repr,
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INTEGER, a INTEGER)")
    con.execute("CREATE TABLE r(k INTEGER, b INTEGER)")
    if left:
        con.executemany("INSERT INTO l VALUES (?, ?)", left)
    if right:
        con.executemany("INSERT INTO r VALUES (?, ?)", right)
    expected = sorted(
        (
            tuple(r)
            for r in con.execute(
                "SELECT k, a FROM l WHERE k NOT IN (SELECT k FROM r)"
            ).fetchall()
        ),
        key=repr,
    )
    con.close()
    assert got == expected, (left, right)
