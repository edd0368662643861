"""Registry priority-window invariants.

The driver's correctness gate walks the registry in insertion order and
may check only a prefix (round 2: exactly the first 50). These tests pin
that any ≥50-entry prefix covers every SURVEY §2 family and every
LLM-pipeline pillar.
"""

from __future__ import annotations

from mariadb_columnstore_engine_spark.plans import load_all
from mariadb_columnstore_engine_spark.plans.registry import PRIORITY_WINDOW

FAMILY_PREFIXES = (
    "tpch_",       # scan/filter/join/agg/sort core
    "filter_",     # §2.2
    "join_",       # §2.3
    "agg_",        # §2.4
    "win_",        # §2.5
    "setop_",      # §2.6/2.7
    "sf_",         # §2.8
    "subq_",       # §2.9
    "collation_",  # §2.8 collation
    "events_",     # LLM pillar: event-time
    "text_",       # LLM pillar: text/dedup
    "sim_",        # LLM pillar: similarity
    "pipeline_",   # LLM pillar: corpus-build primitives
    "udf_",        # §2.11
    "udtf_",       # §2.11 UDTF
)


def test_window_names_all_registered():
    qs = load_all()
    missing = [n for n in PRIORITY_WINDOW if n not in qs]
    assert not missing, f"PRIORITY_WINDOW names not in registry: {missing}"


def test_window_is_the_registry_prefix():
    names = list(load_all())
    assert tuple(names[: len(PRIORITY_WINDOW)]) == PRIORITY_WINDOW


def test_every_family_has_driver_evidence():
    """Round-2 intent, round-6 form: the window used to guarantee every
    family inside any 50-prefix; once most rows had recorded driver
    CORRECTNESS entries, the window rotates to the never-checked tail
    instead (r6 closes the ledger). The invariant that matters is that
    every family is driver-evidenced by the CURRENT window or by a
    recorded CORRECTNESS round — so no family ever ships on local
    evidence alone."""
    import glob
    import json
    import os

    covered = set(list(load_all())[:50])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        covered |= set(json.load(open(f)))
    for prefix in FAMILY_PREFIXES:
        assert any(
            n.startswith(prefix) for n in covered
        ), f"family {prefix!r} has no driver correctness evidence"


def test_window_queries_all_have_oracles():
    qs = load_all()
    missing = [n for n in PRIORITY_WINDOW if qs[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
