"""Exhaustive NULL/truthiness grids for the r9 dialect lowerings.

XOR and row-constructor comparisons both carry 3-valued logic that a
few hand vectors can miss; these tests enumerate the full small
cross-product in ONE Spark statement each and compare against a
Python model of the MariaDB semantics (Item_func_xor::val_int and
Arg_comparator::compare_row, sql/item_cmpfunc.cc).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from mariadb_columnstore_engine_spark.functions.sqltrans import (  # noqa: E501,E402
    translate_statement,
)

#: operand spellings and their MariaDB truthiness (None = SQL NULL,
#: strings take the my_strtod prefix read)
XOR_OPERANDS: list[tuple[str, object]] = [
    ("NULL", None),
    ("0", False),
    ("1", True),
    ("2", True),
    ("-3", True),
    ("0.0", False),
    ("'5x'", True),     # prefix 5 -> truthy
    ("'abc'", False),   # no numeric prefix -> 0
    ("''", False),
]


def _xor_model(a, b):
    if a is None or b is None:
        return None
    return a != b


def test_xor_full_grid(spark):
    cols, expect = [], []
    for i, (sa, ta) in enumerate(XOR_OPERANDS):
        for j, (sb, tb) in enumerate(XOR_OPERANDS):
            cols.append(
                f"CAST(CASE WHEN {sa} XOR {sb} THEN 1 ELSE 0 END AS INT)"
                f" AS x{i}_{j}")
            # CASE maps NULL -> ELSE arm (0), true -> 1
            m = _xor_model(ta, tb)
            expect.append(1 if m else 0)
    row = spark.sql(
        translate_statement("SELECT " + ", ".join(cols))
    ).collect()[0]
    got = list(row)
    assert got == expect, [
        (XOR_OPERANDS[k // len(XOR_OPERANDS)][0],
         XOR_OPERANDS[k % len(XOR_OPERANDS)][0], g, e)
        for k, (g, e) in enumerate(zip(got, expect)) if g != e
    ]


def test_xor_null_propagation_bare(spark):
    """Outside a CASE arm the NULL must survive (not collapse to 0)."""
    row = spark.sql(translate_statement(
        "SELECT (NULL XOR 1) a, (NULL XOR NULL) b, (0 XOR NULL) c,"
        " (1 XOR 1) d, (1 XOR 0) e"
    )).collect()[0]
    assert (row.a, row.b, row.c) == (None, None, None)
    assert (bool(row.d), bool(row.e)) == (False, True)


#: row-comparison element spellings: (sql, python value or None)
ROW_ELEMS = [("NULL", None), ("1", 1), ("2", 2)]


def _eq3(a, b):
    """3-valued element equality."""
    if a is None or b is None:
        return None
    return a == b


def _and3(x, y):
    if x is False or y is False:
        return False
    if x is None or y is None:
        return None
    return True


def test_row_comparison_full_grid(spark):
    """(a1,a2) = (b1,b2) and <> over every NULL/1/2 combination —
    pairwise equality folded with 3-valued AND, inequality its NOT."""
    cols, expect = [], []
    n = len(ROW_ELEMS)
    idx = 0
    for a1 in range(n):
        for a2 in range(n):
            for b1 in range(n):
                for b2 in range(n):
                    sa1, va1 = ROW_ELEMS[a1]
                    sa2, va2 = ROW_ELEMS[a2]
                    sb1, vb1 = ROW_ELEMS[b1]
                    sb2, vb2 = ROW_ELEMS[b2]
                    cols.append(
                        f"(({sa1}, {sa2}) = ({sb1}, {sb2})) AS e{idx}")
                    cols.append(
                        f"(({sa1}, {sa2}) <> ({sb1}, {sb2})) AS n{idx}")
                    eq = _and3(_eq3(va1, vb1), _eq3(va2, vb2))
                    expect.append(eq)
                    expect.append(None if eq is None else not eq)
                    idx += 1
    row = spark.sql(
        translate_statement("SELECT " + ", ".join(cols))
    ).collect()[0]
    got = list(row)
    assert got == expect, [
        (cols[k], g, e)
        for k, (g, e) in enumerate(zip(got, expect)) if g != e
    ]
