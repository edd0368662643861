"""Predicate-fuzz parity: randomized filters must count identically in
Spark and DuckDB over the same parquet.

A miniature sqlsmith for the scan/filter layer (§2.2): hypothesis
generates predicate trees over lineitem's numeric/string columns; both
engines run the SAME generated SQL text, so any count divergence is an
engine-semantics bug (pushdown, null handling, comparison coercion).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUM_COLS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 100000),
    "l_discount": (0, 0.1),
    "l_tax": (0, 0.08),
    "l_linenumber": (1, 7),
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicate(draw, depth: int = 0):
    kind = draw(st.integers(0, 3 if depth < 2 else 1))
    if kind <= 1:  # leaf
        if draw(st.booleans()):
            col = draw(st.sampled_from(sorted(NUM_COLS)))
            lo, hi = NUM_COLS[col]
            # integer grid scaled into [lo, hi] — st.floats is unusable
            # here (a fast-math-compiled native lib breaks its FP checks)
            step = draw(st.integers(0, 10000))
            val = round(lo + (hi - lo) * step / 10000, 4)
            op = draw(st.sampled_from(OPS))
            return f"{col} {op} {val}"
        col = draw(st.sampled_from(sorted(STR_COLS)))
        val = draw(st.sampled_from(STR_COLS[col]))
        op = draw(st.sampled_from(["=", "<>", "<", ">="]))
        return f"{col} {op} '{val}'"
    a = draw(predicate(depth + 1))
    b = draw(predicate(depth + 1))
    conj = "AND" if kind == 2 else "OR"
    if draw(st.booleans()):
        return f"(({a}) {conj} NOT ({b}))"
    return f"(({a}) {conj} ({b}))"


@pytest.fixture(scope="module")
def lineitem_view(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "fuzz_lineitem"
    )
    return "fuzz_lineitem"


@given(st.lists(predicate(), min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicates_count_identically(
    spark, duck, sf_dir, lineitem_view, preds
):
    # one round-trip per engine for the whole batch of predicates
    spark_sql = "SELECT " + ", ".join(
        f"count(CASE WHEN {p} THEN 1 END) AS c{i}"
        for i, p in enumerate(preds)
    ) + f" FROM {lineitem_view}"
    duck_sql = "SELECT " + ", ".join(
        f"count(CASE WHEN {p} THEN 1 END) AS c{i}"
        for i, p in enumerate(preds)
    ) + " FROM lineitem"
    srow = spark.sql(spark_sql).collect()[0]
    drow = duck.execute(duck_sql).fetchone()
    for i, p in enumerate(preds):
        assert srow[i] == drow[i], f"count mismatch for predicate: {p}"
