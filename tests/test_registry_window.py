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


def test_first_50_covers_every_family():
    first50 = list(load_all())[:50]
    for prefix in FAMILY_PREFIXES:
        assert any(
            n.startswith(prefix) or n == "multimodal_media_features"
            and prefix == "udf_"
            for n in first50
        ), f"family {prefix!r} missing from the first 50 registry entries"


def test_window_queries_all_have_oracles():
    qs = load_all()
    missing = [n for n in PRIORITY_WINDOW if qs[n].oracle is None]
    assert not missing, f"window queries without oracle SQL: {missing}"
