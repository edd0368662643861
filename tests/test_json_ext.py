"""Known-vector tests for the MariaDB JSON long tail
(functions/json_ext.py). Vectors follow the MariaDB documentation
examples for JSON_TYPE / JSON_DEPTH / JSON_QUOTE / JSON_SEARCH /
JSON_MERGE_PRESERVE / JSON_NORMALIZE / JSON_COMPACT (reference:
utils/funcexp/func_json_*.cpp; jsonhelpers.cpp).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.functions import json_ext as J


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_json_type_classification(spark):
    cases = [
        ('{"a": 1}', "OBJECT"),
        ("[1, 2]", "ARRAY"),
        ('"s"', "STRING"),
        ("true", "BOOLEAN"),
        ("false", "BOOLEAN"),
        ("null", "NULL"),
        ("-42", "INTEGER"),
        ("3.14", "DOUBLE"),
        ("1e9", "DOUBLE"),
    ]
    for doc, expected in cases:
        assert _one(spark, J.json_type(F.lit(doc))) == expected, doc
    assert _one(spark, J.json_type(F.lit(None).cast("string"))) is None


def test_json_depth_nesting(spark):
    # MariaDB: scalar/empty container = 1, flat container = 2, +1/level
    cases = [
        ("1", 1),
        ('"x"', 1),
        ("{}", 1),
        ("[]", 1),
        ('{"a": 1}', 2),
        ("[10, 20]", 2),
        ("[[], {}]", 2),
        ('{"a": [1]}', 3),
        ('[1, [2, 3]]', 3),
        ('{"a": {"b": {"c": []}}}', 4),
        # brackets inside string literals must not count
        ('{"a": "[{["}', 2),
    ]
    for doc, expected in cases:
        assert _one(spark, J.json_depth(F.lit(doc))) == expected, doc


def test_json_quote_escapes(spark):
    cases = [
        ("plain", '"plain"'),
        ('with "quotes"', '"with \\"quotes\\""'),
        ("back\\slash", '"back\\\\slash"'),
        ("line\nbreak\ttab", '"line\\nbreak\\ttab"'),
    ]
    for raw, expected in cases:
        assert _one(spark, J.json_quote(F.lit(raw))) == expected, raw


def test_json_search_flat(spark):
    doc = F.lit('{"a": "1", "b": "x", "c": "x"}')
    # first match in document order, returned as a JSON path string
    assert _one(spark, J.json_search(doc, "x")) == '"$.b"'
    assert _one(spark, J.json_search(doc, "zz")) is None


def test_json_merge_preserve_flat(spark):
    a = F.lit('{"a": 1, "b": "x"}')
    b = F.lit('{"b": 2, "c": true}')
    assert (
        _one(spark, J.json_merge_preserve(a, b))
        == '{"a":1,"b":["x",2],"c":true}'
    )
    # disjoint keys: plain union, a's keys first
    assert (
        _one(spark, J.json_merge_preserve(F.lit('{"z": 1}'), F.lit('{"a": 2}')))
        == '{"z":1,"a":2}'
    )


def test_json_normalize_sorts_keys(spark):
    assert (
        _one(spark, J.json_normalize(F.lit('{"b": 2,  "a": "x"}')))
        == '{"a":"x","b":2}'
    )


def test_json_compact_preserves_string_spaces(spark):
    assert (
        _one(spark, J.json_compact(F.lit('{ "a" : [1, 2],  "b" : "x  y" }')))
        == '{"a":[1,2],"b":"x  y"}'
    )


def test_json_loose_readable_form(spark):
    # MariaDB doc vector: space after ':' and ',' OUTSIDE strings only
    assert (
        _one(spark, J.json_loose(F.lit('{"a":1,"b":[1,2],"s":"x:y,z"}')))
        == '{"a": 1, "b": [1, 2], "s": "x:y,z"}'
    )
    # idempotent on already-loose input (compact normalizes first)
    assert (
        _one(spark, J.json_loose(F.lit('{ "a" : 1 ,  "b" : 2 }')))
        == '{"a": 1, "b": 2}'
    )


def test_sha1_known_vector(spark):
    # completes the checksum family (md5/sha2 are oracle-checked in
    # sf_string_battery2; sha1 has no DuckDB twin in this build)
    assert (
        _one(spark, F.sha1(F.lit("abc").cast("binary")))
        == hashlib.sha1(b"abc").hexdigest()
    )


def test_json_search_quotes_non_identifier_keys(spark):
    """Keys that don't lex as identifiers print as quoted members with
    escapes — MariaDB's path form — never an unbalanced splice."""
    doc = F.lit('{"my key": "x"}')
    assert _one(spark, J.json_search(doc, "x")) == '"$.\\"my key\\""'
    doc2 = F.lit('{"a\\"b": "x"}')  # key is a"b
    assert _one(spark, J.json_search(doc2, "x")) == '"$.\\"a\\\\\\"b\\""'
    import json

    path = json.loads(_one(spark, J.json_search(doc, "x")))
    assert path == '$."my key"'


def test_json_path_ext_negative_last_range(spark):
    """MariaDB 10.9 JSON path extensions (json_range_expression.test):
    negative indices, last[-N], and [A to B] range slices — compiled to
    JVM ops from the literal path."""
    from mariadb_columnstore_engine_spark.functions.json_ext import (
        json_path_ext,
    )

    doc = (
        '{"A": [0, [1,2,3], [4,5,6], "seven", 0.8, true, false,'
        ' "eleven", [12,13,15], true], "B": {"C": 1}}'
    )
    df = spark.createDataFrame([(doc,)], ["j"])
    cases = {
        "$.A[-2][-1]": "15",       # the reference test's exact path
        "$.A[last-1][last]": "15",  # ... and its 'last' spelling
        "$.A[last]": "true",
        "$.A[0]": "0",
        "$.B.C": "1",
        "$.A[1 to 2]": "[[1,2,3], [4,5,6]]",
        "$.A[last-1 to last]": '[[12,13,15], true]',
        "$.A[99]": None,            # out of range -> NULL
        "$.A[-99]": None,
    }
    row = df.select(
        *[
            json_path_ext("j", p).alias(f"c{i}")
            for i, p in enumerate(cases)
        ]
    ).collect()[0]
    for (p, want), got in zip(cases.items(), row):
        assert got == want, f"{p}: {got!r} != {want!r}"
