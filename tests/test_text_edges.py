"""Short-document edge cases for the shingle-based dedup family.

Spark's sequence(1, 0) yields DESCENDING [1, 0] rather than an empty
array, so an ungated trigram build crashes with
INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any document with < 3 tokens; the
DuckDB oracle's range(1, len-1) is empty for the same input. These tests
pin the gated build: short docs yield empty shingle sets in BOTH engines
and the dedup plans survive their presence.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.plans.text_plans import (
    _shingles,
    _tokens,
)


def test_shingles_short_docs_empty_not_crash(spark):
    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",),
         ("one two three four",)],
        "text string",
    )
    out = df.select(
        _shingles(_tokens(F.col("text"))).alias("sh")
    ).collect()
    got = [r.sh for r in out]
    assert got[0] == []            # empty text
    assert got[1] == []            # 1 token
    assert got[2] == []            # 2 tokens
    assert got[3] == ["one two three"]
    assert got[4] == ["one two three", "two three four"]


def test_shingles_match_duckdb_on_short_docs(spark, duck):
    rows = duck.execute(
        "SELECT list_distinct(list_transform(range(1, len(w) - 1), "
        "  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh "
        "FROM (SELECT string_split(t, ' ') AS w FROM (VALUES ('one'), "
        "  ('one two'), ('one two three')) v(t))"
    ).fetchall()
    duck_sh = [r[0] for r in rows]
    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three",)], "text string"
    )
    spark_sh = [
        r.sh
        for r in df.select(
            _shingles(_tokens(F.col("text"))).alias("sh")
        ).collect()
    ]
    assert spark_sh == duck_sh
