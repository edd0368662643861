"""Augmented probe fixture (tools/gen_probe_fixture.py): the driver
fixtures carry a TPC-H column subset; the generator appends every
standard column the subset omits plus the partsupp table, all
deterministic functions of the existing keys, so the MTR probe can
value-check statements that previously landed in the fixture-gap
bucket (COVERAGE.md §r8, VERDICT r8 #4). These tests pin determinism,
the spec shapes (4 suppliers per part, spec date windows, phone
format), and that BOTH engines (Spark catalog + DuckDB oracle) see the
optional partsupp table identically.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def probe_dir(tmp_path_factory):
    from gen_probe_fixture import generate

    dest = str(tmp_path_factory.mktemp("probe_fixture") / "sf")
    generate(SF_DIR, dest)
    return dest


def _md5s(d: str) -> dict[str, str]:
    return {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
    }


def test_deterministic(probe_dir, tmp_path):
    from gen_probe_fixture import generate

    again = str(tmp_path / "again")
    generate(SF_DIR, again)
    assert _md5s(probe_dir) == _md5s(again)


def test_standard_columns_present(probe_dir):
    import pyarrow.parquet as pq

    want = {
        "region": {"r_comment"},
        "nation": {"n_comment"},
        "customer": {"c_address", "c_phone", "c_comment"},
        "supplier": {"s_address", "s_phone", "s_comment"},
        "part": {"p_mfgr", "p_container", "p_comment"},
        "orders": {"o_clerk", "o_shippriority", "o_comment"},
        "lineitem": {
            "l_commitdate", "l_receiptdate", "l_shipinstruct",
            "l_shipmode", "l_comment",
        },
        "partsupp": {
            "ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost",
            "ps_comment",
        },
        # SSB star schema (reference include/ssb/createTables.inc)
        "lineorder": {
            "lo_orderkey", "lo_linenumber", "lo_custkey", "lo_partkey",
            "lo_suppkey", "lo_orderdate", "lo_orderpriority",
            "lo_shippriority", "lo_quantity", "lo_extendedprice",
            "lo_ordtotalprice", "lo_discount", "lo_revenue",
            "lo_supplycost", "lo_tax", "lo_commitdate", "lo_shipmode",
        },
        "dateinfo": {
            "d_datekey", "d_date", "d_dayofweek", "d_month", "d_year",
            "d_yearmonthnum", "d_yearmonth", "d_daynuminweek",
            "d_daynuminmonth", "d_daynuminyear", "d_monthnuminyear",
            "d_weeknuminyear", "d_sellingseason", "d_lastdayinweekfl",
            "d_lastdayinmonthfl", "d_holidayfl", "d_weekdayfl",
        },
    }
    for t, cols in want.items():
        names = set(pq.read_schema(f"{probe_dir}/{t}.parquet").names)
        assert cols <= names, (t, cols - names)


def test_partsupp_spec_shape(probe_dir):
    import pyarrow.parquet as pq

    ps = pq.read_table(f"{probe_dir}/partsupp.parquet").to_pandas()
    per_part = ps.groupby("ps_partkey")["ps_suppkey"].nunique()
    assert (per_part == 4).all()  # dbgen: exactly 4 suppliers per part
    part = pq.read_table(f"{probe_dir}/part.parquet").to_pandas()
    assert len(ps) == 4 * len(part)
    supp = pq.read_table(f"{probe_dir}/supplier.parquet").to_pandas()
    # referential integrity: every ps_suppkey joins supplier
    assert set(ps.ps_suppkey) <= set(supp.s_suppkey)


def test_lineitem_spec_date_windows(probe_dir):
    import pyarrow.parquet as pq

    li = pq.read_table(f"{probe_dir}/lineitem.parquet").to_pandas()
    o = pq.read_table(f"{probe_dir}/orders.parquet").to_pandas()
    m = li.merge(o[["o_orderkey", "o_orderdate"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    commit_lag = (m.l_commitdate - m.o_orderdate).dt.days
    assert commit_lag.between(30, 90).all()
    receipt_lag = (li.l_receiptdate - li.l_shipdate).dt.days
    assert receipt_lag.between(1, 30).all()


def test_ssb_star_schema(probe_dir):
    import pyarrow.parquet as pq

    lo = pq.read_table(f"{probe_dir}/lineorder.parquet").to_pandas()
    li = pq.read_table(f"{probe_dir}/lineitem.parquet").to_pandas()
    assert len(lo) == len(li)  # one lineorder row per lineitem row
    di = pq.read_table(f"{probe_dir}/dateinfo.parquet").to_pandas()
    assert di.d_datekey.is_unique
    dk = set(di.d_datekey)
    # every lineorder date key resolves through the date dimension
    assert set(lo.lo_orderdate) <= dk
    assert set(lo.lo_commitdate) <= dk
    # discounts are SSB whole percents
    assert lo.lo_discount.between(0, 10).all()
    # geo columns derive from the real nation/region joins
    c = pq.read_table(f"{probe_dir}/customer.parquet").to_pandas()
    n = pq.read_table(f"{probe_dir}/nation.parquet").to_pandas()
    r = pq.read_table(f"{probe_dir}/region.parquet").to_pandas()
    m = c.merge(n, left_on="c_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey")
    assert (m.c_nation == m.n_name).all()
    assert (m.c_region == m.r_name).all()
    # brand1 nests in category (dbgen hierarchy)
    p = pq.read_table(f"{probe_dir}/part.parquet").to_pandas()
    assert p.apply(
        lambda row: row.p_brand1.startswith(row.p_category), axis=1
    ).all()


def test_phone_format(probe_dir):
    import pyarrow.parquet as pq

    c = pq.read_table(f"{probe_dir}/customer.parquet").to_pandas()
    assert c.c_phone.str.match(r"^\d{2}-\d{3}-\d{3}-\d{4}$").all()


def test_engine_and_oracle_see_partsupp(spark, probe_dir):
    from mariadb_columnstore_engine_spark.engine import Engine
    from mariadb_columnstore_engine_spark.oracle import duckdb_connect

    eng = Engine(spark, probe_dir)
    q = ("SELECT ps_partkey, COUNT(*) AS n, ROUND(SUM(ps_supplycost), 2) "
         "AS c FROM partsupp GROUP BY ps_partkey ORDER BY ps_partkey "
         "LIMIT 5")
    srows = [tuple(r) for r in eng.sql(q).collect()]
    con = duckdb_connect(probe_dir)
    orows = [tuple(r) for r in con.execute(q).fetchall()]
    assert srows == [(k, n, pytest.approx(float(c))) for k, n, c in orows]
    # SSB Q1.1 shape through both engines (reference mcs7707 family)
    q2 = ("SELECT ROUND(SUM(lo_extendedprice * lo_discount), 2) AS rev "
          "FROM lineorder, dateinfo WHERE lo_orderdate = d_datekey "
          "AND d_year = 1997 AND lo_discount BETWEEN 1 AND 3 "
          "AND lo_quantity < 25")
    s2 = eng.sql(q2).collect()[0][0]
    o2 = con.execute(q2).fetchall()[0][0]
    con.close()
    assert s2 == pytest.approx(float(o2))
    assert s2 and s2 > 0  # the predicate selects real rows


def test_driver_fixture_unaffected(spark):
    """Optional tables are absent in the driver fixture: the catalog
    registers none and still refuses unknown names."""
    from mariadb_columnstore_engine_spark.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    assert cat.optional_tables_present() == ()
    with pytest.raises(KeyError):
        cat.table("lineorder_staging")
