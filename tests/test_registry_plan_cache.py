"""Focused tests for the registry's session-scoped built-plan memo
(registry._cached_plan, VERDICT r12 #7).

The suite-wide default is MCS_PLAN_CACHE=0 (conftest) so plan-shape
tests that monkeypatch builder internals always build fresh; these
tests re-enable the memo locally via monkeypatch.setenv and pin its
contract: hit on identical (query, sf_dir, fixture fingerprint),
rebuild on fixture rewrite, rebuild when disabled, no interference
with results.
"""

from __future__ import annotations

import shutil

import pytest

from mariadb_columnstore_engine_spark.plans import load_all
from mariadb_columnstore_engine_spark.plans.registry import (
    _fixture_fingerprint,
)

SPECS = load_all()


@pytest.fixture()
def plan_cache_on(monkeypatch, spark):
    monkeypatch.setenv("MCS_PLAN_CACHE", "1")
    # isolate from any state a previous test left behind
    if hasattr(spark, "_mcs_query_plan_cache"):
        spark._mcs_query_plan_cache.clear()
    yield
    if hasattr(spark, "_mcs_query_plan_cache"):
        spark._mcs_query_plan_cache.clear()


def test_cache_hit_returns_fresh_wrap_over_same_plan(
    spark, sf_dir, plan_cache_on
):
    """A hit must NOT return the memoized Dataset instance (re-running
    one instance lets the DAGScheduler skip its already-computed
    shuffle stages — result caching, not plan reuse). It returns a
    fresh Dataset (new QueryExecution, new shuffle IDs) over the SAME
    analyzed plan."""
    fn = SPECS["tpch_q1_pricing_summary"].fn
    assert hasattr(fn, "__wrapped__"), "bench query not wrapped by memo"
    df1 = fn(spark, sf_dir)
    df2 = fn(spark, sf_dir)
    assert df2 is not df1, "hit must wrap, never hand back the instance"
    # same analyzed plan (the thing being memoized)…
    assert df2._jdf.queryExecution().analyzed().sameResult(
        df1._jdf.queryExecution().analyzed()
    )
    # …but a distinct QueryExecution, so execution starts from parquet
    assert not df2._jdf.queryExecution().equals(
        df1._jdf.queryExecution()
    )
    # and the memo key keeps hitting (the stored entry is stable)
    df3 = fn(spark, sf_dir)
    assert df3 is not df2


def test_cache_disabled_rebuilds(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("MCS_PLAN_CACHE", "0")
    fn = SPECS["tpch_q1_pricing_summary"].fn
    assert fn(spark, sf_dir) is not fn(spark, sf_dir)


def test_fixture_rewrite_invalidates(spark, sf_dir, tmp_path, plan_cache_on):
    fixture = tmp_path / "sfcopy"
    fixture.mkdir()
    for t in ("lineitem",):
        shutil.copy(f"{sf_dir}/{t}.parquet", fixture / f"{t}.parquet")
    fp1 = _fixture_fingerprint(str(fixture))
    assert fp1 is not None
    # rewrite one table: same bytes, new mtime_ns → new fingerprint
    data = (fixture / "lineitem.parquet").read_bytes()
    (fixture / "lineitem.parquet").write_bytes(data)
    fp2 = _fixture_fingerprint(str(fixture))
    assert fp1 != fp2, "mtime_ns rewrite must change the fingerprint"
    # and the memo rebuilds: q6 touches only lineitem
    fn = SPECS["tpch_q6_forecast_revenue"].fn
    df1 = fn(spark, str(fixture))
    (fixture / "lineitem.parquet").write_bytes(data)
    assert fn(spark, str(fixture)) is not df1


def test_fingerprint_refuses_directory_tables(tmp_path):
    d = tmp_path / "fix"
    (d / "orders.parquet").mkdir(parents=True)
    assert _fixture_fingerprint(str(d)) is None
    assert _fixture_fingerprint(str(tmp_path / "missing")) is None


def test_cached_plan_results_match_fresh_build(spark, sf_dir, plan_cache_on):
    """The memo returns a lazy plan — a second, cached invocation must
    produce the identical rows (recomputed from parquet, not replayed)."""
    fn = SPECS["tpch_q6_forecast_revenue"].fn
    first = fn(spark, sf_dir).collect()
    second = fn(spark, sf_dir).collect()
    assert first == second


def test_events_nanos_conf_reasserted_on_hit(spark, sf_dir, plan_cache_on):
    """A cached events plan misdecodes TIMESTAMP(NANOS) if something
    reset the legacy conf between builds — the memo must re-assert it
    on every hit (ADVICE r12 / catalog._ensure_nanos_conf)."""
    fn = SPECS["events_sessionization"].fn
    df1 = fn(spark, sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df2 = fn(spark, sf_dir)
    assert df2 is not df1  # fresh wrap over the cached plan
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    )
    # and the cached plan still executes
    assert df2.limit(1).collect() is not None
