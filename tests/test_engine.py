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
