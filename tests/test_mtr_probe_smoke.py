"""MTR cross-probe smoke: a deterministic slice of the full 8k-probe
corpus (COVERAGE.md §r9) runs inside pytest so harvest + dialect
wiring + augmented fixture stay green between full probe runs.

The full probe (tools/mtr_probe.py, ~35 min) stays the authoritative
tally; this slice pins the plumbing: statements harvest with the
augmented table set, the engine and DuckDB read the same generated
fixture, both-parsed statements value-match, and the only tolerated
divergences are the adjudicated families (COVERAGE.md §r9: the
round(int)-rendering DIFFs of mcs7005 and the under-determined
ORDER-BY-ties LIMIT of mcs7041).
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
    "mcs7005_regression_bug2589.test",  # duckdb round(int) rendering
    "mcs7041_regression_bug3019.test",  # ORDER BY cnt ties + LIMIT
    "mcs7022_regression_bug2907.test",  # same tie-LIMIT family; the
    # pair flip-flops between runs (COVERAGE.md §round 10b)
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
        harvest,
        restore_overlays,
        rows_match,
    )

    eng, con, sf_dir = probe_env
    stmts = harvest(DEFAULT_SUITES, AUGMENTED_TABLES)
    assert len(stmts) > 7000  # the corpus keeps its r9 width
    sample = stmts[::STRIDE][:CAP]
    n_both = n_match = 0
    diffs, neither = [], []
    for src, s, ov in sample:
        saved = (
            apply_overlays(eng.spark, con, sf_dir, ov) if ov else {}
        )
        try:
            drows = con.execute(duck_dialect(s)).fetchall()
        except Exception:  # noqa: BLE001 — bucketed like the probe
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
        if saved:
            restore_overlays(eng.spark, con, sf_dir, saved)
        if srows is None and drows is None and src not in ADJUDICATED:
            neither.append((src, s))
        if srows is None or drows is None:
            continue
        n_both += 1
        if rows_match(srows, drows):
            n_match += 1
        elif src not in ADJUDICATED:
            diffs.append((src, s))
    assert not neither, neither
    assert not diffs, diffs
    # the slice must actually exercise the value-check path broadly
    assert n_both >= 60 and n_match == n_both


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
