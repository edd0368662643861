"""Window-frame fuzz parity (§2.5): randomized ROWS/RANGE frames must
aggregate identically in Spark and DuckDB.

Rows get a UNIQUE order key (ROWS frames over tied order keys are
legitimately nondeterministic — peer order is unspecified — so ties are
excluded by construction; RANGE frames are checked with tied keys too,
where peers make results deterministic again).
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

_rows = st.lists(
    st.tuples(
        st.integers(0, 2),      # partition key
        st.integers(0, 50),     # value
    ),
    min_size=1,
    max_size=20,
)
_bound = st.one_of(st.none(), st.integers(0, 5))  # None = UNBOUNDED


def _frame_sql(pre, post, unit):
    lo = "UNBOUNDED PRECEDING" if pre is None else f"{pre} PRECEDING"
    hi = "UNBOUNDED FOLLOWING" if post is None else f"{post} FOLLOWING"
    return f"{unit} BETWEEN {lo} AND {hi}"


@given(rows=_rows, pre=_bound, post=_bound, unit=st.sampled_from(["ROWS", "RANGE"]))
@settings(**_SETTINGS)
def test_window_frames_match_duckdb(spark, rows, pre, post, unit):
    # unique order key i; RANGE orders by a tie-prone key derived from i
    data = [(i, p, v, v % 7) for i, (p, v) in enumerate(rows)]
    order_col = "tie" if unit == "RANGE" else "i"
    frame = _frame_sql(pre, post, unit)
    q = f"""
        SELECT i,
               CAST(sum(v) OVER (PARTITION BY p ORDER BY {order_col}
                    {frame}) AS BIGINT) AS s,
               CAST(count(*) OVER (PARTITION BY p ORDER BY {order_col}
                    {frame}) AS BIGINT) AS c
        FROM t ORDER BY i
    """
    sdf = spark.createDataFrame(data, "i long, p long, v long, tie long")
    sdf.createOrReplaceTempView("t")
    got = [tuple(r) for r in spark.sql(q).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, p BIGINT, v BIGINT, tie BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data)
    expected = con.execute(q).fetchall()
    con.close()
    assert got == expected, (frame, order_col, data)
