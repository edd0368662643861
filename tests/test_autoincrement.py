"""AUTO_INCREMENT columns: per-table sequence counter in the evolution
sidecar (≈ BRM's autoincrement manager; basic/t/autoincrement-filtering
.test). INSERT assigns omitted/NULL values from the counter; explicit
values pass through and push the counter past them; the counter survives
copy-on-write DML and compaction.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def eng_ai(spark, sf_dir, tmp_path):
    from mariadb_columnstore_engine_spark.engine import Engine

    os.makedirs(str(tmp_path / "wh"), exist_ok=True)
    eng = Engine(spark, sf_dir, warehouse=str(tmp_path / "wh"))
    eng.execute(
        "CREATE TABLE seq_t ("
        " id BIGINT NOT NULL AUTO_INCREMENT,"
        " v VARCHAR(10),"
        " PRIMARY KEY (id))"
    )
    return eng


def _rows(eng):
    return sorted(
        (r.id, r.v) for r in eng.execute("SELECT * FROM seq_t").collect()
    )


def test_assigns_sequence_when_omitted(eng_ai):
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('a'), ('b'), ('c')")
    ids = [i for i, _ in _rows(eng_ai)]
    assert sorted(ids) == [1, 2, 3]


def test_explicit_null_draws_from_counter(eng_ai):
    eng_ai.execute("INSERT INTO seq_t (id, v) VALUES (NULL, 'a')")
    eng_ai.execute("INSERT INTO seq_t (id, v) VALUES (NULL, 'b')")
    assert [i for i, _ in _rows(eng_ai)] == [1, 2]


def test_explicit_value_bumps_counter(eng_ai):
    eng_ai.execute("INSERT INTO seq_t (id, v) VALUES (100, 'x')")
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('y')")
    assert _rows(eng_ai) == [(100, "x"), (101, "y")]


def test_counter_survives_delete_and_filtering(eng_ai):
    # autoincrement-filtering.test: predicates on the autoinc column
    # behave like any integer column; deleted ids are not reused
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('a'), ('b'), ('c')")
    eng_ai.execute("DELETE FROM seq_t WHERE id >= 2")
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('d')")
    rows = _rows(eng_ai)
    assert rows == [(1, "a"), (4, "d")]
    got = eng_ai.execute(
        "SELECT v FROM seq_t WHERE id > 1"
    ).collect()
    assert [r.v for r in got] == ["d"]


def test_counter_survives_compaction(eng_ai, tmp_path):
    from mariadb_columnstore_engine_spark.sources.maintenance import (
        compact_table,
    )

    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('a'), ('b')")
    path = eng_ai._writable("seq_t")["path"]
    compact_table(eng_ai.spark, path, target_file_mb=64)
    eng_ai._refresh("seq_t")
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('c')")
    assert _rows(eng_ai) == [(1, "a"), (2, "b"), (3, "c")]


def test_last_insert_id(eng_ai):
    assert eng_ai.execute("SELECT LAST_INSERT_ID()") == 0
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('a'), ('b')")
    assert eng_ai.execute("SELECT LAST_INSERT_ID()") == 1  # first of batch
    eng_ai.execute("INSERT INTO seq_t (v) VALUES ('c')")
    assert eng_ai.execute("SELECT LAST_INSERT_ID()") == 3
    # explicit-id insert does not move LAST_INSERT_ID (MariaDB rule)
    eng_ai.execute("INSERT INTO seq_t (id, v) VALUES (100, 'x')")
    assert eng_ai.execute("SELECT LAST_INSERT_ID()") == 3
