"""As-of (point-in-time) join — a composition operator Spark lacks.

Neither the reference (no range/as-of join, SURVEY §2.3: theta only as
post-join filter) nor Spark has a native ASOF JOIN; DuckDB does, which
makes it a perfect oracle. The Spark implementation is the scalable
union-and-carry pattern:

1. tag right rows (the quote/state stream) and left rows (the probes),
2. union them into one keyed stream,
3. one shuffle: window over (by-key, ordered by event time, right rows
   first on ties for >= semantics),
4. ``last(struct(values), ignorenulls=True)`` carries the latest
   right-hand ROW forward onto every left row. The carry is one struct
   (non-null exactly on right rows), not per-column ``last`` calls —
   per-column carries would skip a genuinely-NULL value on the matched
   right row and resurrect a stale value from an older one.

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
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` from the
    latest ``right_ts`` <= (or < if inclusive=False) ``left_ts`` within
    the same ``by`` key. Left rows with no prior right row get NULLs
    (ASOF LEFT JOIN semantics).

    ``tolerance_seconds`` bounds the match gap: a prior right row older
    than the bound is treated as no match (the production variant —
    "latest sensor reading, but only if fresher than N seconds"). The
    bound is applied to the carried match after the single shuffle, so
    the cost model is unchanged."""
    # right rows sort before left rows on ts ties iff inclusive
    r_marker, l_marker = (0, 1) if inclusive else (1, 0)
    # NULL by-keys never match (equi-join / DuckDB ASOF semantics):
    # Window.partitionBy would group NULL keys into one partition and
    # happily carry a NULL-keyed right row onto a NULL-keyed left row,
    # so drop NULL-keyed right rows up front. NULL-keyed left rows stay
    # (left-join semantics) and get NULL values via the empty carry.
    right = right.where(F.col(by).isNotNull())
    r = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_t"),
        F.lit(r_marker).alias("_side"),
        # right rows are identified by _is_left IS NULL; a constant marker
        # (not monotonically_increasing_id) — id-stability caveats under
        # task retry make ids a needless risk in a correctness operator
        F.lit(None).cast("int").alias("_is_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l_cols = left.columns
    l = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_t"),
        F.lit(l_marker).alias("_side"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}")
          for c in value_cols],
        *[F.col(c) for c in l_cols],
    )
    w = (
        Window.partitionBy("_by")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row (non-null exactly on right rows, even when
    # every value inside is NULL) so per-column NULLs ride along with the
    # matched row instead of being skipped by ignorenulls.
    carry_src = F.when(
        F.col("_is_left").isNull(),
        F.struct(
            F.col("_t").alias("_rt"),
            *[F.col(f"_v_{c}").alias(c) for c in value_cols],
        ),
    )
    carried = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("_vrow", carry_src)
        .select("*", F.last("_vrow", ignorenulls=True).over(w).alias("_asof"))
    )
    match = F.col("_asof")
    if tolerance_seconds is not None:
        gap = F.col("_t").cast("timestamp").cast("double") - F.col(
            "_asof._rt"
        ).cast("timestamp").cast("double")
        match = F.when(gap <= tolerance_seconds, F.col("_asof"))
    out = carried.where(F.col("_is_left").isNotNull()).select(
        *l_cols,
        *[match.getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return out
