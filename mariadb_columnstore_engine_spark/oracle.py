"""DuckDB-oracle comparison helpers (shared by tools/check_parity.py and
the pytest parity suite).

Mirrors the driver's correctness gate: row count, schema (column names,
sorted), and order-insensitive value comparison with columns sorted by
name. Floats must already be rounded inside the queries themselves (see
plans/tpch.py float policy).
"""

from __future__ import annotations

import math

import duckdb

from mariadb_columnstore_engine_spark.catalog import TABLES


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):  # Row/struct collected as dict
        return tuple((k, norm_cell(v[k])) for k in sorted(v))
    return v


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every fixture table registered as a view (the
    driver pre-registers the same views for oracle SQL)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(spark, con, spec, sf_dir: str) -> list[str]:
    """Run spec through Spark and its oracle through DuckDB; return a list
    of problem strings (empty = parity)."""
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        return []  # rows-only contract: executing without error is the check
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema spark={sorted(scols)} duck={sorted(ocols)}")
    if not problems:
        a = normalize(srows, scols)
        b = normalize(orows, ocols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ, first diffs: {diffs}")
    return problems
