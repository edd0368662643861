"""WEEK(date, mode) parity for all 8 MariaDB modes.

The Spark expression (functions/dialect.py week_mode) is checked against
a direct Python transcription of sql-common my_time.c calc_week, which
is itself anchored to the documented MySQL/MariaDB vectors and to ISO
8601 (mode 3 == isocalendar) — three independent fixings of the same
semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.functions.dialect import (
    week_mode,
    yearweek_mode,
)


def _calc_daynr(y, m, d):
    delsum = 365 * y + 31 * (m - 1) + d
    if m <= 2:
        y -= 1
    else:
        delsum -= (m * 4 + 23) // 10
    return delsum + y // 4 - y // 100 + y // 400


def _days_in_year(y):
    return 366 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) else 365


def week_ref(y, m, d, mode):
    mf = bool(mode & 1)
    wy = bool(mode & 2)
    fw = bool(mode & 4)
    if not mf:
        fw = not fw
    daynr = _calc_daynr(y, m, d)
    first_daynr = _calc_daynr(y, 1, 1)
    weekday = (first_daynr + 5 + (0 if mf else 1)) % 7
    year = y
    if m == 1 and d <= 7 - weekday:
        if not wy and ((fw and weekday != 0) or (not fw and weekday >= 4)):
            return 0
        wy = True
        year -= 1
        days = _days_in_year(year)
        first_daynr -= days
        weekday = (weekday + 53 * 7 - days) % 7
    if (fw and weekday != 0) or (not fw and weekday >= 4):
        days = daynr - (first_daynr + (7 - weekday))
    else:
        days = daynr - (first_daynr - weekday)
    if wy and days >= 52 * 7:
        weekday = (weekday + _days_in_year(year)) % 7
        if (not fw and weekday < 4) or (fw and weekday == 0):
            return 1
    return days // 7 + 1


def test_reference_matches_documented_vectors():
    assert week_ref(2008, 2, 20, 0) == 7
    assert week_ref(2008, 2, 20, 1) == 8
    assert week_ref(2008, 12, 31, 1) == 53
    assert week_ref(2000, 1, 1, 0) == 0
    assert week_ref(2000, 1, 1, 2) == 52
    assert week_ref(1987, 1, 1, 0) == 0
    assert week_ref(1987, 1, 1, 2) == 52  # YEARWEEK('1987-01-01')=198652
    day = dt.date(1990, 1, 1)
    while day < dt.date(2040, 1, 1):
        assert week_ref(day.year, day.month, day.day, 3) == (
            day.isocalendar()[1]
        ), day
        day += dt.timedelta(days=11)


def test_spark_week_matches_reference_all_modes(spark):
    # every year-boundary week + a mid-year sample, 1999..2032
    days = []
    for y in range(1999, 2033):
        for m, d0 in ((1, 1), (12, 25)):
            for off in range(8):
                base = dt.date(y, m, d0) + dt.timedelta(days=off)
                days.append(base)
        days.append(dt.date(y, 6, 15))
    df = spark.createDataFrame([(d,) for d in days], "d date")
    exprs = [
        week_mode(F.col("d"), mode).alias(f"m{mode}") for mode in range(8)
    ]
    rows = df.select("d", *exprs).collect()
    for r in rows:
        for mode in range(8):
            expected = week_ref(r.d.year, r.d.month, r.d.day, mode)
            assert r[f"m{mode}"] == expected, (r.d, mode, r[f"m{mode}"],
                                               expected)


def test_yearweek_owning_year(spark):
    vec = [
        (dt.date(1987, 1, 1), 0, 198652),
        (dt.date(2000, 1, 1), 0, 199952),
        (dt.date(2008, 12, 29), 3, 200901),  # ISO: Monday of week 1 2009
        (dt.date(2008, 2, 20), 0, 200807),
    ]
    df = spark.createDataFrame([(d, m, e) for d, m, e in vec],
                               "d date, mode int, expected long")
    for d, m, e in vec:
        got = (
            df.where(F.col("d") == F.lit(d))
            .select(yearweek_mode(F.col("d"), m).alias("yw"))
            .collect()[0]
            .yw
        )
        assert got == e, (d, m, got, e)
