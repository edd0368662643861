"""As-of (point-in-time) join — a composition operator Spark lacks.

Neither the reference (no range/as-of join, SURVEY §2.3: theta only as
post-join filter) nor Spark has a native ASOF JOIN; DuckDB does, which
makes it a perfect oracle. The Spark implementation is the scalable
union-and-carry pattern:

1. tag right rows (the quote/state stream) and left rows (the probes),
2. union them into one keyed stream,
3. one shuffle: window over (by-key, ordered by event time, right rows
   first on ties for >= semantics),
4. ``last(value, ignorenulls=True)`` carries the latest right-hand value
   forward onto every left row.

Cost: ONE shuffle of left+right on the by-key — same order as the
equi-join lower bound; no range-explosion, no per-row probes. At 100 TB
the window partitions are per-entity (users, instruments), bounded and
parallel. A broadcast variant is unnecessary: the carry is computed
in-partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` from the
    latest ``right_ts`` <= (or < if inclusive=False) ``left_ts`` within
    the same ``by`` key. Left rows with no prior right row get NULLs
    (ASOF LEFT JOIN semantics)."""
    # right rows sort before left rows on ts ties iff inclusive
    r_marker, l_marker = (0, 1) if inclusive else (1, 0)
    r = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_t"),
        F.lit(r_marker).alias("_side"),
        F.lit(None).cast("long").alias("_left_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l_cols = left.columns
    l = left.withColumn("_left_row", F.monotonically_increasing_id()).select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_t"),
        F.lit(l_marker).alias("_side"),
        "_left_row",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}")
          for c in value_cols],
        *[F.col(c) for c in l_cols],
    )
    w = (
        Window.partitionBy("_by")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r, allowMissingColumns=True).select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_left_row").isNotNull()).select(
        *l_cols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols]
    )
    return out
