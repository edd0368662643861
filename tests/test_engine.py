"""Engine facade: SQL entry point + UDF registration + catalog."""

from __future__ import annotations

from mariadb_columnstore_engine_spark.engine import Engine


def test_engine_sql_and_udfs(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    rows = eng.sql(
        "SELECT o_orderstatus, round(engine_median(o_totalprice), 2) AS med "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ).collect()
    assert len(rows) == 3 and all(r.med > 0 for r in rows)
    assert eng.table("region").count() == 5
    plan = eng.explain("SELECT count(*) FROM lineitem WHERE l_quantity < 5")
    assert "PushedFilters" in plan


def test_views_and_describe(spark, sf_dir, tmp_path):
    import shutil

    from mariadb_columnstore_engine_spark.engine import Engine

    # private warehouse copy so the persisted-view sidecar doesn't touch
    # the shared read-only fixtures
    wh = str(tmp_path / "wh")
    shutil.copytree(sf_dir, wh)
    eng = Engine(spark, wh)
    eng.create_view(
        "big_orders",
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 100000",
        persist=True,
    )
    n = eng.sql("SELECT count(*) AS n FROM big_orders").collect()[0].n
    assert n == eng.table("orders").where("o_totalprice > 100000").count()
    assert eng.describe("big_orders") == [
        ("o_orderkey", "bigint"), ("o_totalprice", "double")
    ]
    # a NEW engine over the same warehouse re-registers the view
    eng2 = Engine(spark, wh)
    assert eng2.sql("SELECT count(*) AS n FROM big_orders").collect()[0].n == n
    eng2.drop_view("big_orders")
    import os

    import json
    with open(os.path.join(wh, "_views.json")) as f:
        assert "big_orders" not in json.load(f)


def test_setop_string_numeric_normalization(spark, sf_dir, duck):
    """MariaDB set operations coerce a position mixing string and
    numeric branches to a character type (sql_union result types;
    mcs7126/mcs7195); Spark picks the numeric side and fails casting
    'AFRICA' at runtime. The engine analyzes branches and casts the
    conflicted positions to STRING — including set ops nested in
    derived tables, duplicate select-list names, and the union-level
    ORDER BY tail."""
    eng = Engine(spark, sf_dir)
    q1 = ("select * from region where 2=2 union "
          "select n_regionkey, n_nationkey from nation "
          "where 0=1")
    got = {tuple(r) for r in eng.sql(q1).collect()}
    want = {tuple(r) for r in duck.execute(q1).fetchall()}
    assert got == want and len(got) == 5
    # nested in a derived table + duplicate column names + tail
    q2 = ("select count(*) from (select * from region union select "
          "distinct r_regionkey, r_regionkey from "
          "region)a order by 1")
    assert eng.sql(q2).collect()[0][0] == \
        duck.execute(q2).fetchall()[0][0]
    # no-conflict set ops are left untouched (same text in, same out)
    q3 = "select n_regionkey from nation union select r_regionkey from region"
    assert eng._normalize_setop_types(q3) == q3


def test_setop_intersect_precedence_grouping(spark, sf_dir):
    """INTERSECT binds tighter than UNION (both engines); a string
    branch in one UNION arm must not force a numeric INTERSECT in
    another arm to compare as strings — DECIMAL 1.0 vs BIGINT 1 must
    still intersect numerically, with the coercion applied only to the
    INTERSECT's result at the UNION level (ADVICE r9)."""
    eng = Engine(spark, sf_dir)
    q = ("SELECT 'x' UNION SELECT CAST(1.0 AS DECIMAL(5,1)) "
         "INTERSECT SELECT CAST(1 AS BIGINT)")
    got = sorted(r[0] for r in eng.sql(q).collect())
    assert got == ["1.0", "x"], got
    # pure INTERSECT chain with a genuine string/numeric conflict
    # still coerces within the chain
    got2 = [r[0] for r in eng.sql(
        "SELECT '1' a INTERSECT SELECT 1").collect()]
    assert got2 == ["1"]
    # UNION/EXCEPT stay left-associative at the outer level
    got3 = sorted(r[0] for r in eng.sql(
        "SELECT 'x' a UNION SELECT 2 EXCEPT SELECT 2").collect())
    assert got3 == ["x"]
