"""MODA aggregate semantics (utils/regr/moda.h:32-35,
mcs98_moda_function.test): greatest occurrence count, ties broken by
closest-to-group-AVG, then smallest value. Hand-built vectors pin each
tie-break stage; the registry row agg_moda pins the fixture-scale parity.
"""

from __future__ import annotations

import pytest

from mariadb_columnstore_engine_spark.operators.moda import moda


def _moda_of(spark, values, expect):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    [row] = moda(df, "v").collect()
    assert row["moda"] == expect, (values, row["moda"], expect)


def test_plain_mode_no_tie(spark):
    _moda_of(spark, [1.0, 2.0, 2.0, 3.0], 2.0)


def test_tie_broken_by_closest_to_avg(spark):
    # counts: 1→2, 2→2, 3→1; avg = 9/5 = 1.8 → 2 is closer (0.2 < 0.8)
    _moda_of(spark, [1.0, 1.0, 2.0, 2.0, 3.0], 2.0)


def test_tie_equidistant_takes_smallest(spark):
    # counts tied 1↔3, avg = 2, both at distance 1 → smallest wins
    _moda_of(spark, [1.0, 3.0], 1.0)


def test_nulls_ignored_and_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("a", 5.0), ("a", 7.0), ("b", None)],
        "g string, v double",
    )
    got = {r["g"]: r["moda"] for r in moda(df, "v", ("g",)).collect()}
    assert got == {"a": 5.0, "b": None}


def test_grouped_independent_ties(spark):
    # group x: mode 4 outright; group y: tie 10↔20, avg 14 → 10 closer
    rows = [("x", 4.0), ("x", 4.0), ("x", 9.0),
            ("y", 10.0), ("y", 10.0), ("y", 20.0), ("y", 20.0),
            ("y", 10.0), ("y", 20.0), ("y", 14.0)]
    # recompute: counts y: 10→3, 20→3, 14→1; avg = (30+60+14)/7 = 14.857
    # dist(10)=4.857, dist(20)=5.143 → 10 wins
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["moda"] for r in moda(df, "v", ("g",)).collect()}
    assert got == {"x": 4.0, "y": 10.0}


def test_global_moda_has_no_single_partition_window(spark):
    """The no-group path must not funnel all distinct values through a
    Window.partitionBy(lit(1)) single task — the global weighted mean is
    a 1-row aggregate broadcast back (scale-safe at any distinct-value
    cardinality)."""
    df = spark.createDataFrame([(float(i % 7),) for i in range(100)],
                               "v double")
    plan = moda(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # 0.0 and 1.0 tie at 15 occurrences; weighted mean = 2.95 → 1.0 wins
    [row] = moda(df, "v").collect()
    assert row["moda"] == 1.0


def test_string_column_rejected(spark):
    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(TypeError):
        moda(df, "s")


def test_moda_sql_spelling(spark, sf_dir):
    """`CREATE AGGREGATE FUNCTION moda` UX (moda.h:29-31): after
    register_all, plain SQL `SELECT moda(x) .. GROUP BY g` works and
    matches the JVM-side grouped operator."""
    import pyspark.sql.functions as F

    from mariadb_columnstore_engine_spark.engine import Engine
    from mariadb_columnstore_engine_spark.operators.moda import moda as moda_op

    eng = Engine(spark, sf_dir)
    got = {
        r.l_returnflag: r.m
        for r in eng.sql(
            "SELECT l_returnflag, moda(l_quantity) AS m FROM lineitem "
            "GROUP BY l_returnflag"
        ).collect()
    }
    expected = {
        r.l_returnflag: r.moda
        for r in moda_op(
            eng.table("lineitem"), "l_quantity", ("l_returnflag",)
        ).collect()
    }
    assert got == expected
