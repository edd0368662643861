"""UDF / UDAF registration surface (§2.11).

Reference analogue: the distributed UDF SDK (utils/udfsdk/udfsdk.h) and
the mcsv1_UDAF contract — init / nextValue (per-PM partial) / subEvaluate
(merge) / evaluate (final) (utils/udfsdk/mcsv1_udaf.h:461-604). On Spark
the same distributed partial/merge execution comes for free from
Arrow-vectorized pandas UDFs: SCALAR for row functions, GROUPED_AGG for
aggregates (Catalyst handles partials/merges; no dropValue retraction
needed in batch).

UDF objects are built lazily: ``pandas_udf`` needs an active
SparkContext to parse its return type, and this module is imported by
the plan registry before any session exists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession

_CACHE: dict[str, object] = {}


def _median():
    if "median" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def median_impl(v: pd.Series) -> float:
            return float(v.median())

        _CACHE["median"] = median_impl
    return _CACHE["median"]


def _char_ratio():
    if "char_ratio" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def char_ratio_impl(s: pd.Series) -> pd.Series:
            return s.map(lambda x: len(set(x)) / len(x) if x else 0.0)

        _CACHE["char_ratio"] = char_ratio_impl
    return _CACHE["char_ratio"]


def _moda():
    if "moda" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def moda_impl(v: pd.Series) -> float:
            # utils/regr/moda.h:32-35 semantics: greatest count, ties →
            # closest to AVG, then smallest. GROUPED_AGG form = the
            # reference's `CREATE AGGREGATE FUNCTION moda` UX; the
            # JVM-side composition (operators/moda.py) stays the scale
            # path for hot queries.
            vv = v.dropna()
            if vv.empty:
                return float("nan")
            counts = vv.value_counts()
            avg = vv.mean()
            best = sorted(
                counts.items(),
                key=lambda kv: (-kv[1], abs(kv[0] - avg), kv[0]),
            )[0][0]
            return float(best)

        _CACHE["moda"] = moda_impl
    return _CACHE["moda"]


def moda_udaf(col: Column | str) -> Column:
    """GROUPED_AGG pandas UDAF spelling of MODA (SQL: ``SELECT
    moda(x) ... GROUP BY g`` after register_all)."""
    return _moda()(col)


def median_udaf(col: Column | str) -> Column:
    """GROUPED_AGG pandas UDAF: exact interpolated median (the SDK
    example utils/udfsdk/median.cpp; equals percentile_cont(0.5))."""
    return _median()(col)


def char_ratio_udf(col: Column | str) -> Column:
    """SCALAR pandas UDF: unique-char / length ratio (Arrow batched;
    stands in for any custom per-row computation)."""
    return _char_ratio()(col)


def register_all(spark: SparkSession) -> None:
    """Expose the UDFs to spark.sql (≈ CREATE FUNCTION in the reference,
    dbcon/mysql/ha_mcs_udf.cpp)."""
    spark.udf.register("engine_median", _median())
    spark.udf.register("engine_char_ratio", _char_ratio())
    spark.udf.register("moda", _moda())
