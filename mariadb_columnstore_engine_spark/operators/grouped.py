"""Grouped-map operators via ``applyInPandas``.

The §2.11 surface beyond scalar/agg UDFs: per-group DataFrame→DataFrame
transforms (the reference's UDAF SDK has no equivalent — this is a free
upgrade). One Arrow batch per group lands in pandas; the group count
bounds parallelism, so at 100 TB choose group keys with cardinality ≫
executor count (the same rule as WindowFunctionStep's per-partition
thread dispatch, dbcon/joblist/windowfunctionstep.h:67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Normalize ``value_col`` to z-scores within each group (sample
    stddev, ddof=1 — matches STDDEV_SAMP)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def norm(pdf):
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[out_col] = (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)
