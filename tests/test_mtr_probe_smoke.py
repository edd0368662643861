"""MTR cross-probe smoke: a deterministic slice of the full 8k-probe
corpus (COVERAGE.md §r9) runs inside pytest so harvest + dialect
wiring + augmented fixture stay green between full probe runs.

The full probe (tools/mtr_probe.py, ~35 min) stays the authoritative
tally; this slice pins the plumbing: statements harvest with the
augmented table set, the engine and DuckDB read the same generated
fixture, both-parsed statements value-match, and the only tolerated
divergences are the adjudicated families (r12: none left — mcs7005
matches via the render retry and the mcs7041/mcs7022 tie-LIMIT pair
is stabilized by a deterministic tie-break on both engines).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from tests.conftest import SF_DIR  # noqa: E402

#: statements sampled from the harvest (every STRIDE-th), capped
STRIDE = 80
CAP = 110

#: adjudicated divergence sources (COVERAGE.md §r9; mcs7167 left the
#: set in r10 — its transient ADD COLUMN now REPLAYS as a view
#: overlay, so the statement value-checks)
ADJUDICATED = {
    # r12: the tie-LIMIT pair (mcs7041/mcs7022) left the set — the
    # probe now appends a deterministic tie-break (ordinal 1, the
    # unique grouped key) to their ORDER BY ... LIMIT derived tables
    # on BOTH engines (mtr_probe.stabilize_tie_limit), so the
    # compared sets are well-defined and the statements value-check.
    # r11: mcs7005 left the set — its round(int)-inside-concat rows
    # now MATCH via the retry-on-DIFF MariaDB text rendering
    # (duck_dialect_render); unsigned_aggregate's AVG divergence was
    # a canon ASYMMETRY (Decimal cells skipped the large-magnitude
    # significant-digit cap floats got) fixed at the root in canon().
}


@pytest.fixture(scope="module")
def probe_env(spark, tmp_path_factory):
    from gen_probe_fixture import generate

    from mariadb_columnstore_engine_spark.engine import Engine
    from mariadb_columnstore_engine_spark.oracle import duckdb_connect

    dest = str(tmp_path_factory.mktemp("probe_smoke") / "sf")
    generate(SF_DIR, dest)
    eng = Engine(spark, dest)
    con = duckdb_connect(dest)
    yield eng, con, dest
    con.close()


def test_probe_corpus_slice(spark, probe_env):
    from mtr_probe import (
        AUGMENTED_TABLES,
        DEFAULT_SUITES,
        apply_overlays,
        duck_dialect,
        duck_dialect_render,
        harvest,
        restore_overlays,
        rows_match,
        stabilize_tie_limit,
        tolerance_family,
    )

    eng, con, sf_dir = probe_env
    stmts = harvest(DEFAULT_SUITES, AUGMENTED_TABLES)
    assert len(stmts) > 7000  # the corpus keeps its r9 width
    sample = stmts[::STRIDE][:CAP]
    n_both = n_match = 0
    diffs, neither = [], []
    for src, s, ov in sample:
        s = stabilize_tie_limit(src, s)
        saved = (
            apply_overlays(eng.spark, con, sf_dir, ov) if ov else {}
        )
        # try/finally mirrors the probe (ADVICE r10): overlays must be
        # restored even if an exception escapes the bucketed handlers
        try:
            try:
                drows = con.execute(duck_dialect(s)).fetchall()
            except Exception:  # noqa: BLE001 — bucketed like probe
                drows = None
            try:
                r = eng.execute(s)
                srows = (
                    [tuple(x) for x in r.limit(100000).collect()]
                    if hasattr(r, "limit")
                    else [tuple(x) for x in r] if isinstance(r, list)
                    else [(r,)]
                )
            except Exception:  # noqa: BLE001
                srows = None
        finally:
            if saved:
                restore_overlays(eng.spark, con, sf_dir, saved)
        if srows is None and drows is None and src not in ADJUDICATED:
            neither.append((src, s))
        if srows is None or drows is None:
            continue
        n_both += 1
        verdict = rows_match(
            srows, drows,
            allow_tolerance=tolerance_family(src) is not None)
        if not verdict:
            # same retry-on-DIFF rendering pass as the full probe
            try:
                drows2 = con.execute(duck_dialect_render(s)).fetchall()
                verdict = rows_match(srows, drows2,
                                     allow_tolerance=False)
            except Exception:  # noqa: BLE001
                pass
        if verdict:
            n_match += 1
        elif src not in ADJUDICATED:
            diffs.append((src, s))
    assert not neither, neither
    assert not diffs, diffs
    # the slice must actually exercise the value-check path broadly
    assert n_both >= 60 and n_match == n_both


def test_tolerance_fallback_scoped_to_battery_families():
    """VERDICT r10 #3: the rel-1e-9/abs-floor re-pairing fires ONLY on
    the declared window-battery families. A synthetic sub-1e-4
    divergence on a non-battery statement registers as a DIFF; the
    same rows pass (as "tol") for a battery source. The floor itself
    tightens to 1e-6 for cells of magnitude below 1e-2 (ADVICE r10),
    so tiny CORR/REGR moments can't hide unbounded relative error."""
    from mtr_probe import rows_match, tolerance_family

    # family detection
    assert tolerance_family(
        "mcs6178_windowFunctions_CORR.test"
    ) == "mcs6178_windowFunctions_CORR"
    assert tolerance_family("mcs7005_regression_bug2589.test") is None

    # sub-grid divergence: 0.00003 vs 0.00012 differs under exact
    # canon (4-dec rounds to 0.0 vs 0.0001) AND exceeds the scoped
    # small-magnitude floor 1e-6 — DIFF regardless of scope
    a, b = [(0.00003,)], [(0.00012,)]
    assert rows_match(a, b, allow_tolerance=False) is None
    assert rows_match(a, b, allow_tolerance=True) is None

    # accumulation-order noise on a large moment straddling the
    # 12-sig-digit canon grid: passes ONLY with tolerance enabled
    # (the battery case the fallback exists for)
    big_a, big_b = [(1234567890124.9,)], [(1234567890125.1,)]
    # force a canon straddle by picking values across a grid line
    ga, gb = [(0.12344999,)], [(0.12345001,)]
    assert rows_match(ga, gb, allow_tolerance=True) == "tol"
    assert rows_match(ga, gb, allow_tolerance=False) is None
    assert rows_match(big_a, big_b, allow_tolerance=True) == "tol"

    # exact path unaffected by scope
    assert rows_match([(1, "x")], [(1, "x")],
                      allow_tolerance=False) == "exact"


def test_second_chance_dialect_families():
    """r11 (VERDICT r10 #6): the second-chance dialect maps each
    classified spark-only family onto DuckDB-expressible SQL with
    MariaDB's values. Pinned per family against live DuckDB — these
    are exactly the spellings the fallback exists for, with expected
    values computed from MariaDB semantics by hand."""
    import duckdb

    from mtr_probe import duck_dialect_fallback, duck_dialect_fallback2

    con = duckdb.connect()

    def run(sql):
        return con.execute(duck_dialect_fallback(sql)).fetchall()

    # PERCENTILE_CONT/DISC .. WITHIN GROUP .. OVER → quantile window;
    # DESC maps through the negation identity
    got = run(
        "select PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY x DESC)"
        " OVER (PARTITION BY g) from (values (1,1),(2,1),(3,1),(4,1))"
        " t(x,g) limit 1")
    assert got[0][0] == 3.25  # 0.25 from the top of [1..4]
    got = run(
        "select PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x)"
        " OVER (PARTITION BY g) from (values (1,1),(2,1)) t(x,g)"
        " limit 1")
    assert got[0][0] == 1  # first value with cume_dist >= 0.5
    # double-quoted literals convert ONLY in literal positions;
    # aliases stay identifiers
    got = run('select case when 1=1 then "yes" else "no" end as "a1"')
    assert got == [("yes",)]
    # isnull() / locate() / infix regexp / infix xor / limit n,m
    assert run("select isnull(NULL), isnull(7)") == [(1, 0)]
    assert run("select locate('A', 'BANANA'), locate('A', 'BANANA', 3)"
               ) == [(2, 4)]
    assert run("select 1 from (values ('ASIA')) t(r) where"
               " r regexp '.*S.*'") == [(1,)]
    assert run("select case when 3 xor 0 then 1 else 0 end") == [(1,)]
    assert run("select x from (values (1),(2),(3)) t(x) order by x"
               " limit 1, 2") == [(2,), (3,)]
    # numeric coercions: substr/round/reverse on numbers, string+0,
    # int × bool
    assert run("select substr(12345, 2, 3)") == [("234",)]
    assert run("select round('AFRICA', 2), round('12abc', 1)"
               ) == [(0.0, 12.0)]
    assert run("select reverse(123)") == [("321",)]
    assert run("select substr('x075', 2, 3) + 0") == [(75.0,)]
    assert run("select 5 * (2 > 1)") == [(5,)]
    # format(n, 0) thousands separators; date_format/get_format
    assert run("select format(1234567, 0)") == [("1,234,567",)]
    assert run("select date_format('2011-06-16', '%y:%m:%d')"
               ) == [("11:06:16",)]
    assert run("select get_format(date, 'USA')") == [("%m.%d.%Y",)]
    # value-match CASE over a boolean operand (MariaDB coerces to 0/1)
    assert run("select case 1=2 when 0 then 'ne' else 'eq' end"
               ) == [("ne",)]
    # last-resort pass: mixed-type IF branches stringify like MariaDB
    got = con.execute(duck_dialect_fallback2(
        "select if(1 > 2, 'name', 42)")).fetchall()
    assert got == [("42",)]


def test_harvest_transient_ddl_overlays(tmp_path):
    """r10: in-test ALTER TABLE ADD/DROP COLUMN replays as view
    overlays — SELECTs between the ADD and DROP carry the overlay,
    SELECTs after the DROP do not, and the dedup key includes the
    overlay state so identical SELECT text under different DDL is NOT
    collapsed."""
    from mtr_probe import harvest

    (tmp_path / "synthetic_ddl.test").write_text(
        "alter table nation add column c1 varchar(20) default 'abcd';\n"
        "select distinct(c1) from nation;\n"
        "select n_name from nation;\n"
        "alter table nation drop column c1;\n"
        "select n_name from nation;\n"
        "alter table nation add column c2 int;\n"
        "select c2 from nation;\n"
        "alter table nation drop column c2;\n"
    )
    stmts = harvest([str(tmp_path)], {"nation"})
    by_sql = {}
    for _, s, ov in stmts:
        by_sql.setdefault(s, []).append(ov)
    assert by_sql["select distinct(c1) from nation"] == [
        (("nation", "c1", "CAST('abcd' AS VARCHAR(20))"),)
    ]
    # same text, two overlay states → two harvested entries
    assert sorted(by_sql["select n_name from nation"]) == [
        (), (("nation", "c1", "CAST('abcd' AS VARCHAR(20))"),)
    ]
    # ADD without DEFAULT overlays a typed NULL
    assert by_sql["select c2 from nation"] == [
        (("nation", "c2", "CAST(NULL AS BIGINT)"),)
    ]


def test_canon_exact_ints_capped_floats():
    """r12 (r11 ADVICE #3): Python-int cells compare EXACTLY — two
    13-digit BIGINT sums differing in trailing digits must NOT
    canon-equal under the 12-significant-digit cap (which exists for
    IEEE-double accumulation ulps, not exact integers). Cross-type
    equality survives: an int and the same value as a grid float
    still match via the shared tag + Python numeric ==."""
    from decimal import Decimal

    from mtr_probe import canon

    # two different exact 13-digit integers: MUST differ
    a, b = 1234567890123, 1234567890124
    assert canon([(a,)]) != canon([(b,)])
    # ...whereas two floats at the same magnitude differing only in
    # the sub-cap digits ride the grid (accumulation-order ulps)
    assert canon([(1.2345678901234e12,)]) == canon([(1.2345678901235e12,)])
    # cross-type: int vs integral float vs integral Decimal all equal
    assert canon([(10500,)]) == canon([(10500.0,)]) == \
        canon([(Decimal("10500.0000"),)])
    # a float a hair off the integer still lands ON it via the grid
    assert canon([(10500.000000000002,)]) == canon([(10500,)])
    # integral Decimal below 2^53 (double-exact range): exact
    assert canon([(Decimal("1234567890123"),)]) != \
        canon([(Decimal("1234567890124"),)])
    # non-integral Decimal vs DOUBLE AVG (the r11 root-cause pair)
    # keeps matching through the shared grid
    assert canon([(Decimal("92233720368547.7580"),)]) == \
        canon([(92233720368547.758,)])


def test_stabilize_tie_limit_scoped_rewrite():
    """r12 (VERDICT r11 #6): the tie-LIMIT stabilizer appends ordinal
    1 (the unique grouped key) to every ORDER BY feeding a LIMIT —
    only for the two adjudicated sources; other statements and
    LIMIT-less ORDER BYs pass through verbatim."""
    from mtr_probe import stabilize_tie_limit

    s = ("select col1 from (select c col1, count(*) cnt from t"
         " group by 1 having cnt > 2 order by cnt desc limit 100) a"
         " order by 1")
    out = stabilize_tie_limit("mcs7041_regression_bug3019.test", s)
    assert "order by cnt desc, 1 limit 100" in out
    assert out.endswith("order by 1")  # the LIMIT-less outer untouched
    out2 = stabilize_tie_limit(
        "mcs7022_regression_bug2907.test",
        "select * from (select k, count(*) from d group by 1"
        " order by 2 desc limit 1) x")
    assert "order by 2 desc, 1 limit 1" in out2
    # any other source: verbatim
    assert stabilize_tie_limit("mcs7005_regression.test", s) == s
