"""Session user variables (@var): SET / SELECT INTO / references —
the MTR scripts' state-carrying idiom (devregression uses
``select ... into @x`` throughout). Inline ``@x :=`` assignment is
row-order-dependent and refused.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def eng_uv(spark, sf_dir):
    from mariadb_columnstore_engine_spark.engine import Engine

    return Engine(spark, sf_dir)


def test_set_and_reference(eng_uv):
    assert eng_uv.execute("SET @thresh = 10 + 5") == 15
    rows = eng_uv.execute(
        "SELECT n_nationkey FROM nation WHERE n_nationkey > @thresh"
    ).collect()
    assert all(r.n_nationkey > 15 for r in rows) and rows


def test_select_into_vars(eng_uv):
    got = eng_uv.execute(
        "SELECT count(*), max(n_nationkey) INTO @n, @mx FROM nation"
    )
    assert got == [25, 24]
    assert eng_uv.execute("SELECT @n + @mx AS s").collect()[0].s == 49


def test_string_and_null_vars_render_safely(eng_uv):
    eng_uv.execute("SET @name = 'NATION' || '_7'")
    row = eng_uv.execute(
        "SELECT n_nationkey FROM nation WHERE n_name = @name"
    ).collect()
    assert len(row) == 1 and row[0].n_nationkey == 7
    eng_uv.execute("SET @nothing = NULL")
    assert (
        eng_uv.execute("SELECT @nothing IS NULL AS x").collect()[0].x
        is True
    )


def test_unset_var_raises(eng_uv):
    with pytest.raises(ValueError, match="not set"):
        eng_uv.execute("SELECT @nope")


def test_at_inside_literal_untouched(eng_uv):
    row = eng_uv.execute("SELECT 'user@host' AS s").collect()[0]
    assert row.s == "user@host"


def test_into_vars_requires_single_row(eng_uv):
    with pytest.raises(ValueError, match="one row"):
        eng_uv.execute("SELECT n_nationkey INTO @x FROM nation")


def test_prepare_execute_deallocate(eng_uv):
    assert (
        eng_uv.execute(
            "PREPARE q1 FROM 'SELECT count(*) AS n FROM nation"
            " WHERE n_regionkey = ?'"
        )
        == "Statement prepared"
    )
    eng_uv.execute("SET @r = 2")
    n = eng_uv.execute("EXECUTE q1 USING @r").collect()[0].n
    direct = eng_uv.execute(
        "SELECT count(*) AS n FROM nation WHERE n_regionkey = 2"
    ).collect()[0].n
    assert n == direct
    # placeholder count mismatch
    with pytest.raises(ValueError, match="placeholder"):
        eng_uv.execute("EXECUTE q1")
    # PREPARE FROM @var; literal '?' inside strings is not a slot
    eng_uv.execute(
        "SET @src = 'SELECT count(*) AS n FROM nation"
        " WHERE n_name <> ''?'' AND n_regionkey = ?'"
    )
    eng_uv.execute("PREPARE q2 FROM @src")
    assert eng_uv.execute("EXECUTE q2 USING @r").collect()[0].n == direct
    eng_uv.execute("DEALLOCATE PREPARE q1")
    with pytest.raises(Exception):
        eng_uv.execute("EXECUTE q1 USING @r")
