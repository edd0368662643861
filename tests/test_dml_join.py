"""Multi-table UPDATE/DELETE with JOIN (mcs82_update_join.test /
mcs83_delete_join.test; DMLProc routes these through the same CSEP join
machinery). The engine rewrites the join to a single-table EXISTS
predicate on the target — outer-preserved targets additionally evaluate
WHERE against an all-NULL stand-in of the other table.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def eng2(spark, sf_dir, tmp_path):
    from mariadb_columnstore_engine_spark.engine import Engine

    os.makedirs(str(tmp_path / "wh"), exist_ok=True)
    eng = Engine(spark, sf_dir, warehouse=str(tmp_path / "wh"))
    eng.execute("CREATE TABLE t1 (t1_int INT, t1_char VARCHAR(20))")
    eng.execute("CREATE TABLE t2 (t2_int INT, t2_char VARCHAR(20))")
    eng.execute(
        "INSERT INTO t1 (t1_int, t1_char) VALUES "
        "(1,'aaa'), (2,'bab'), (3,'ccc'), (NULL,'dd')"
    )
    eng.execute(
        "INSERT INTO t2 (t2_int, t2_char) VALUES (1,'x'), (2,'y'), (5,'z')"
    )
    return eng


def _t1(eng):
    return {
        (r.t1_int, r.t1_char)
        for r in eng.execute("SELECT * FROM t1").collect()
    }


def test_update_inner_join(eng2):
    eng2.execute(
        "UPDATE t1 JOIN t2 ON t1.t1_int = t2.t2_int SET t1.t1_char = 'sss'"
    )
    assert _t1(eng2) == {(1, "sss"), (2, "sss"), (3, "ccc"), (None, "dd")}


def test_update_inner_join_with_where(eng2):
    eng2.execute(
        "UPDATE t1 INNER JOIN t2 ON t1.t1_int = t2.t2_int "
        "SET t1.t1_char = 'pqrs' WHERE t1_char LIKE '%a%'"
    )
    assert _t1(eng2) == {
        (1, "pqrs"), (2, "pqrs"), (3, "ccc"), (None, "dd")
    }


def test_update_target_on_inner_side_of_left_join(eng2):
    # target t1 is the NULL-supplying side → inner semantics: only
    # matched t1 rows can be updated (mcs82's third statement shape)
    eng2.execute(
        "UPDATE t2 LEFT JOIN t1 ON t1.t1_int = t2.t2_int "
        "SET t1.t1_char = 'xyz' WHERE t1_char LIKE '%b%'"
    )
    assert _t1(eng2) == {(1, "aaa"), (2, "xyz"), (3, "ccc"), (None, "dd")}


def test_update_outer_preserved_target_anti_join(eng2):
    # target on the preserved side + WHERE other-col IS NULL = the
    # classic anti-join update: rows WITHOUT a match
    eng2.execute(
        "UPDATE t1 LEFT JOIN t2 ON t1.t1_int = t2.t2_int "
        "SET t1.t1_char = 'orphan' WHERE t2.t2_int IS NULL"
    )
    assert _t1(eng2) == {
        (1, "aaa"), (2, "bab"), (3, "orphan"), (None, "orphan")
    }


def test_update_join_rejects_other_table_assignment(eng2):
    with pytest.raises(ValueError, match="target table"):
        eng2.execute(
            "UPDATE t1 JOIN t2 ON t1.t1_int = t2.t2_int "
            "SET t1.t1_char = t2.t2_char"
        )


def test_update_join_rejects_mixed_targets(eng2):
    with pytest.raises(ValueError, match="ONE table"):
        eng2.execute(
            "UPDATE t1 JOIN t2 ON t1.t1_int = t2.t2_int "
            "SET t1.t1_char = 'a', t2.t2_char = 'b'"
        )


def test_delete_inner_join_with_on_extras(eng2):
    # mcs83 shape: extra non-key conjunct folded into ON
    eng2.execute(
        "DELETE t1 FROM t1 INNER JOIN t2 ON t1.t1_int = t2.t2_int "
        "AND t1.t1_char LIKE '%a%'"
    )
    assert _t1(eng2) == {(3, "ccc"), (None, "dd")}


def test_delete_anti_join(eng2):
    eng2.execute(
        "DELETE t1 FROM t1 LEFT JOIN t2 ON t1.t1_int = t2.t2_int "
        "WHERE t2.t2_int IS NULL"
    )
    assert _t1(eng2) == {(1, "aaa"), (2, "bab")}


def test_delete_join_target_must_be_joined(eng2):
    with pytest.raises(ValueError, match="not one of the joined"):
        eng2.execute(
            "DELETE t3 FROM t1 JOIN t2 ON t1.t1_int = t2.t2_int"
        )
