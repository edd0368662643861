"""Skew-mitigation helpers: salted two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) covers joins; for
aggregations over a heavily skewed key, salting splits each hot key
across ``n_salts`` reducers and a second, much smaller aggregation
merges the partials — the classic two-stage pattern. The reference has
no shuffle at all (all rows of a key converge on the UM), so its skew
ceiling is a single node; salting is what makes the same aggregate
scale past one reducer on Spark.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    *,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs``: stage-1 aggregate columns (must be algebraic —
    SUM/COUNT/MIN/MAX — so stage 2 can merge them); ``final_aggs``: a
    callable returning the stage-2 merge expressions over the stage-1
    output columns.

    The final result is salt-INVARIANT (stage 2 merges whatever partials
    stage 1 produced), so the salt is chosen purely for spread: a
    round-robin per-partition row counter fans even a hot key whose rows
    are all IDENTICAL (the classic skew case — placeholder records),
    where any content hash would collapse to one salt value and recreate
    the single-reducer hotspot. ``salt_source`` overrides with a content
    hash when a stable row→salt mapping is wanted for debugging.
    """
    if salt_source is not None:
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    else:
        # monotonically_increasing_id is consecutive within a partition,
        # so pmod(n_salts) round-robins rows across all salts regardless
        # of content or placement; id-instability under task retry only
        # re-shuffles WHICH salt a row gets, never the merged result
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return stage1.groupBy(*keys).agg(*final_aggs())


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the small side is replicated ``n_salts``
    times (explode over the salt range), the skewed side gets a
    round-robin salt (the join result is salt-invariant — the small side
    exists at EVERY salt value — so the salt is chosen purely for
    spread), and the join runs on (key, salt) — each hot key fans across
    n_salts reducers even when its rows are byte-identical.

    Prefer AQE's skew-join splitting when it triggers; this explicit
    variant is for joins AQE cannot split (e.g. a key so hot one
    partition exceeds executor memory even after splitting) and costs a
    small-side blow-up of n_salts.

    Only ``inner`` / ``left`` (skewed side preserved) are sound under
    replication: for right/full/right-semi variants every unmatched
    replicated small-side row would surface ``n_salts`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the small side is "
            f"replicated {n_salts}×, so only joins that preserve/probe the "
            "skewed side (inner/left/left_semi/left_anti) are sound"
        )
    salt_vals = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("_salt", F.explode(salt_vals))
    skewed_salted = skewed.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    joined = skewed_salted.join(small_rep, [key, "_salt"], how)
    return joined.drop("_salt")
