"""As-of join edge cases: NULL values on the matched row, timestamp
ties (inclusive vs exclusive), and probes with no prior right row.

These pin the round-3 fixes: the carry is one struct per right row (so a
genuinely-NULL value on the matched right row is returned as NULL, not a
stale value from an older row), and left rows are marked with a constant
rather than monotonically_increasing_id.
"""

from __future__ import annotations

import datetime as dt

from mariadb_columnstore_engine_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0, "m1"),
            ("A", _ts("2024-01-01 10:00:00"), None, "m2"),  # NULL price
            ("A", _ts("2024-01-01 11:00:00"), 30.0, None),  # NULL venue
            ("B", _ts("2024-01-01 12:00:00"), 99.0, "mB"),
        ],
        "sym string, qts timestamp, price double, venue string",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:30:00"), 1),  # matches 09:00 quote
            ("A", _ts("2024-01-01 10:00:00"), 2),  # tie with NULL-price row
            ("A", _ts("2024-01-01 10:30:00"), 3),  # matches NULL-price row
            ("A", _ts("2024-01-01 11:30:00"), 4),  # matches NULL-venue row
            ("B", _ts("2024-01-01 11:00:00"), 5),  # no prior quote for B
            ("C", _ts("2024-01-01 12:00:00"), 6),  # key with no quotes
        ],
        "sym string, tts timestamp, trade_id int",
    )
    return quotes, trades


def _run(spark, inclusive):
    quotes, trades = _fixture(spark)
    out = asof_join(
        trades,
        quotes,
        by="sym",
        left_ts="tts",
        right_ts="qts",
        value_cols=["price", "venue"],
        inclusive=inclusive,
    )
    return {r.trade_id: (r.asof_price, r.asof_venue) for r in out.collect()}


def test_null_value_on_matched_row_is_not_skipped(spark):
    got = _run(spark, inclusive=True)
    # trade 3's latest prior quote (10:00) has price NULL: a per-column
    # ignorenulls carry would resurrect 9:00's 10.0 — must be NULL
    assert got[3] == (None, "m2")
    # trade 4 matches the 11:00 quote whose venue is NULL
    assert got[4] == (30.0, None)


def test_inclusive_tie_takes_equal_timestamp_row(spark):
    got = _run(spark, inclusive=True)
    assert got[2] == (None, "m2")  # 10:00 trade sees the 10:00 quote


def test_exclusive_tie_takes_strictly_earlier_row(spark):
    got = _run(spark, inclusive=False)
    assert got[2] == (10.0, "m1")  # 10:00 trade must NOT see 10:00 quote


def test_no_prior_right_row_yields_nulls(spark):
    got = _run(spark, inclusive=True)
    assert got[5] == (None, None)  # B trade before B's only quote
    assert got[6] == (None, None)  # key never quoted
    assert len(got) == 6  # every left row survives (LEFT semantics)


def test_asof_tolerance_bounds_match_gap(spark):
    """A prior right row older than the tolerance is no match; within
    tolerance it matches normally."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 02:00:00")],
        "k long, lts string",
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7.0)],
        "k long, rts string, v double",
    ).select(
        "k", F.col("rts").cast("timestamp").alias("rts"), "v"
    )
    out = asof_join(
        left, right, by="k", left_ts="lts", right_ts="rts",
        value_cols=["v"], tolerance_seconds=1800.0,
    )
    got = {r.lts.strftime("%H:%M"): r.asof_v for r in out.collect()}
    assert got == {"00:10": 7.0, "02:00": None}


def test_null_by_keys_never_match(spark):
    """Equi-join / DuckDB ASOF semantics: a NULL by-key on either side
    matches nothing — NULL-keyed left rows get NULL values, NULL-keyed
    right rows are never carried onto anything."""
    quotes = spark.createDataFrame(
        [(None, _ts("2024-01-01 09:00:00"), 10.0, "m1"),
         ("A", _ts("2024-01-01 09:00:00"), 20.0, "m2")],
        "sym string, qts timestamp, price double, venue string",
    )
    trades = spark.createDataFrame(
        [(None, _ts("2024-01-01 10:00:00"), 1),
         ("A", _ts("2024-01-01 10:00:00"), 2)],
        "sym string, tts timestamp, trade_id int",
    )
    out = asof_join(
        trades, quotes, by="sym", left_ts="tts", right_ts="qts",
        value_cols=["price", "venue"],
    )
    got = {r.trade_id: (r.asof_price, r.asof_venue) for r in out.collect()}
    assert got[1] == (None, None)  # NULL key: no match despite NULL quote
    assert got[2] == (20.0, "m2")
