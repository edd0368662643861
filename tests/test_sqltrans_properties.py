"""Property tests for the SQL translation/parsing layer.

Pinned invariants:
* literal safety — no rewrite ever fires inside a string literal,
  whatever MariaDB-ish keywords the literal contains;
* idempotence — translating an already-translated statement is a no-op
  (the rewrites' outputs contain no rewritable forms);
* parser round-trip — UPDATE/DELETE/INSERT shapes built from generated
  identifiers and values come back with the same pieces.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st_

from mariadb_columnstore_engine_spark import statements as st
from mariadb_columnstore_engine_spark.functions.sqltrans import (
    translate_statement,
)

_KEYWORDY = st_.sampled_from(
    [
        "GROUP_CONCAT(x SEPARATOR ',')",
        "LIMIT 1, 2",
        "# not a comment",
        "DATE_FORMAT(d, '%Y')",
        "STRAIGHT_JOIN",
        "SQL_CALC_FOUND_ROWS",
        "TO_DAYS(d)",
        "DATE_ADD(d, INTERVAL 1 DAY)",
        "WHERE",
        "VALUES(v)",
        "'nested '' quote'",
    ]
)
_IDENT = st_.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(parts=st_.lists(_KEYWORDY, min_size=1, max_size=4))
@settings(max_examples=60, deadline=None)
def test_literals_are_inert(parts):
    lit = " ".join(parts).replace("'", "''")
    q = f"SELECT '{lit}' AS s FROM t"
    assert translate_statement(q) == q


@given(
    col=_IDENT,
    sep=st_.sampled_from(["|", ",", "; ", "~"]),
    off=st_.integers(0, 99),
    cnt=st_.integers(1, 99),
)
@settings(max_examples=60, deadline=None)
def test_translation_is_idempotent(col, sep, off, cnt):
    q = (
        f"SELECT GROUP_CONCAT({col} ORDER BY {col} SEPARATOR '{sep}') "
        f"FROM t WHERE TO_DAYS({col}) > 3 ORDER BY 1 LIMIT {off}, {cnt}"
    )
    once = translate_statement(q)
    assert translate_statement(once) == once


@given(
    table=_IDENT,
    cols=st_.lists(_IDENT, min_size=1, max_size=4, unique=True),
    val=st_.text(
        alphabet=st_.characters(
            codec="ascii", exclude_characters="\x00", min_codepoint=32
        ),
        max_size=20,
    ),
)
@settings(max_examples=60, deadline=None)
def test_update_parse_roundtrip(table, cols, val):
    lit = "'" + val.replace("\\", "\\\\").replace("'", "''") + "'"
    sets = ", ".join(f"{c} = {lit}" for c in cols)
    p = st.parse(f"UPDATE {table} SET {sets} WHERE {cols[0]} = {lit}")
    assert isinstance(p, st.Update)
    assert p.table == table
    assert list(p.assignments) == cols
    assert all(v == lit for v in p.assignments.values())
    assert p.where == f"{cols[0]} = {lit}"


@given(
    table=_IDENT,
    ids=st_.lists(st_.integers(0, 10_000), min_size=1, max_size=5),
)
@settings(max_examples=60, deadline=None)
def test_insert_values_parse_roundtrip(table, ids):
    values = ", ".join(f"({i}, 'v{i}')" for i in ids)
    p = st.parse(f"INSERT INTO {table} (id, v) VALUES {values}")
    assert isinstance(p, st.Insert)
    assert p.table == table and p.columns == ["id", "v"]
    assert p.source_sql == f"VALUES {values}"
