"""Golden parity suite: every registered query vs its DuckDB oracle.

Mirrors the reference's MTR golden-output strategy (SURVEY §5:
mysql-test/columnstore suites run SQL and diff against expected output) —
here the 'expected output' is DuckDB executing the equivalent ANSI SQL
over the same parquet files.
"""

from __future__ import annotations

import pytest

from mariadb_columnstore_engine_spark.oracle import compare
from mariadb_columnstore_engine_spark.plans import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    problems = compare(spark, duck, spec, sf_dir)
    assert not problems, f"{name}: {'; '.join(problems)}"


def test_registry_names_unique_and_nonempty():
    assert SPECS, "no queries registered"
    for name, spec in SPECS.items():
        assert spec.fn is not None
        assert spec.section, f"{name} missing SURVEY section anchor"


def test_entry_contract(spark):
    """__spark_entry__.entry must run and return a stable-schema DataFrame."""
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
