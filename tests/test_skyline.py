"""Skyline operator unit tests (operators/skyline.py; EDBT 2023
Spark-SQL-skyline pattern). Hand vectors pin dominance semantics incl.
duplicates and the multi-batch final pass; the registry row
op_skyline_pareto pins fixture-scale parity vs the NOT-EXISTS oracle.
"""

from __future__ import annotations

import pytest

from mariadb_columnstore_engine_spark.operators.skyline import skyline


def _sky(spark, rows, **kw):
    df = spark.createDataFrame(rows, "x double, y double")
    return {(r.x, r.y) for r in skyline(df, **kw).collect()}


def test_basic_min_min(spark):
    rows = [(1.0, 4.0), (2.0, 2.0), (4.0, 1.0), (3.0, 3.0), (5.0, 5.0)]
    # (3,3) dominated by (2,2); (5,5) dominated by everything
    assert _sky(spark, rows, minimize=["x", "y"]) == {
        (1.0, 4.0), (2.0, 2.0), (4.0, 1.0)
    }


def test_min_max_mixed(spark):
    rows = [(1.0, 1.0), (2.0, 5.0), (3.0, 5.0), (1.0, 0.0)]
    # minimize x, maximize y: (3,5) dominated by (2,5); (1,0) by (1,1)
    assert _sky(spark, rows, minimize=["x"], maximize=["y"]) == {
        (1.0, 1.0), (2.0, 5.0)
    }


def test_duplicates_survive(spark):
    rows = [(1.0, 1.0), (1.0, 1.0), (2.0, 2.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = skyline(df, minimize=["x", "y"]).collect()
    assert len(got) == 2  # both copies of the non-dominated point


def test_single_criterion_is_min(spark):
    rows = [(3.0, 9.0), (1.0, 7.0), (1.0, 5.0)]
    assert _sky(spark, rows, minimize=["x"]) == {(1.0, 7.0), (1.0, 5.0)}


def test_needs_criteria(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError):
        skyline(df)


def test_many_partitions_exact(spark):
    import pyspark.sql.functions as F

    # 5k points on a grid, spread over 16 partitions; skyline of
    # (minimize a, minimize b) for points (i % 71, (7919 * i) % 73)
    df = (
        spark.range(5000)
        .repartition(16)
        .select(
            (F.col("id") % 71).cast("double").alias("a"),
            ((F.lit(7919) * F.col("id")) % 73).cast("double").alias("b"),
        )
    )
    got = {(r.a, r.b) for r in skyline(df, minimize=["a", "b"]).collect()}
    pts = [(float(i % 71), float((7919 * i) % 73)) for i in range(5000)]
    expected = {
        p
        for p in set(pts)
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in set(pts)
        )
    }
    assert got == expected
