"""Skyline (Pareto-optimal) operator — the EDBT 2023 "Integration of
Skyline Queries into Spark SQL" pattern (PAPERS.md), absent from both
Spark and the reference (no skyline in funcexp/joblist).

Semantics: a row is in the skyline iff no other row dominates it —
dominates = at-least-as-good on every criterion and strictly better on
at least one (MIN criteria: ≤ everywhere, < somewhere; MAX mirrored).
Duplicate criterion vectors never dominate each other, so all copies
survive (matches the NOT-EXISTS SQL definition the oracle uses).

Scale shape (the standard two-phase distributed skyline): phase 1
computes each partition's LOCAL skyline with an Arrow-batched
mapInPandas — no shuffle, output bounded by per-partition skyline size;
phase 2 gathers only those candidates (|candidates| = Σ partition
skylines, typically ≪ N) onto one task and filters once more — local
skylines are a superset of the global one, so this is exact. The
dominance test itself has no JVM-relational spelling short of an O(N²)
self-join, which is why this is a declared Python (Arrow) surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def _local_skyline(
    pdf: pd.DataFrame, minimize: list[str], maximize: list[str]
) -> pd.DataFrame:
    import numpy as np

    if pdf.empty:
        return pdf
    vals = pdf[minimize + maximize].to_numpy(dtype="float64", copy=True)
    ncols = len(minimize)
    vals[:, ncols:] *= -1.0  # maximize → minimize
    # lexicographic order: a later point can never strictly dominate an
    # earlier one, so one pass against the running skyline set is exact
    order = np.lexsort(tuple(vals[:, i] for i in reversed(range(vals.shape[1]))))
    sky_rows: list[int] = []
    sky: list = []
    for i in order:
        p = vals[i]
        dominated = False
        for q in sky:
            if (q <= p).all() and (q < p).any():
                dominated = True
                break
        if not dominated:
            sky.append(p)
            sky_rows.append(i)
    return pdf.iloc[sorted(sky_rows)]


def skyline(
    df: DataFrame,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Pareto-optimal rows of ``df`` under MIN/MAX criteria."""
    mins = list(minimize or [])
    maxs = list(maximize or [])
    if not mins and not maxs:
        raise ValueError("skyline() needs at least one criterion")

    def phase_per_batch(it):
        # each Arrow batch's local skyline is a superset of its rows'
        # contribution to the global skyline — exactness restored in
        # phase 2
        for pdf in it:
            out = _local_skyline(pdf, mins, maxs)
            if not out.empty:
                yield out

    def phase_all(it):
        # the final pass must see ALL candidates at once (mapInPandas
        # splits even a single partition into Arrow batches)
        pdfs = [pdf for pdf in it if not pdf.empty]
        if pdfs:
            yield _local_skyline(pd.concat(pdfs), mins, maxs)

    schema = df.schema
    local = df.mapInPandas(phase_per_batch, schema=schema)
    # candidates are small (Σ local skylines); coalesce avoids a shuffle
    return local.coalesce(1).mapInPandas(phase_all, schema=schema)
