"""Skew scale probe (mcol641-skewed-joins territory): a sort-merge join
whose probe side has ONE pathologically hot key, timed three ways:

  1. AQE skew-split OFF — the hot key's partition lands on a single
     task; its runtime IS the join's runtime (the straggler),
  2. AQE skew-split ON (the session default this engine ships) —
     OptimizeSkewedJoin splits the oversized partition into chunks and
     replicates the matching build rows, and
  3. operators.skew.salted_join — the manual two-sided salting that
     works even where AQE can't see the skew (e.g. non-SMJ plans).

Broadcast is disabled: at 100 TB neither side of a fact-fact join fits
a broadcast, and local[32] would otherwise happily broadcast the dim
and hide the effect. AQE thresholds are lowered so the probe's GB-scale
skew triggers the same code path a 100 TB run's default thresholds
would. All three variants must return identical aggregates.

A finding this probe encodes (kept from its first version): plain
algebraic AGGREGATION over a hot key needs no mitigation at all —
Spark's map-side partial aggregation compresses the hot key to one row
per partition before the shuffle, so salted_agg's two stages buy
nothing (measured 0.94× at 20M rows, 50% hot). Aggregation salting only
matters for holistic aggregates whose partials are row-sized
(collect_list, exact percentile). Join skew is where the straggler is
real.

Usage: python tools/skew_scale_probe.py [rows_millions] [hot_frac]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F


def main() -> int:
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    n = int(n_m * 1_000_000)
    n_dim = 100_000

    from mariadb_columnstore_engine_spark.operators.skew import salted_join
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session("skew-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    # scale the skew thresholds down so this GB-scale probe exercises
    # the same OptimizeSkewedJoin path a 100 TB run hits at defaults
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16MB",
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")

    # deterministic generators, re-evaluated per run (cheap range math;
    # persisting 20M rows in the default heap OOMs the single hot task)
    fact = spark.range(n).select(
        F.when(
            F.rand(seed=7) < hot_frac, F.lit(0)
        ).otherwise(F.pmod(F.col("id"), F.lit(n_dim))).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).cast("double").alias("w"),
    )

    def joined_plain():
        return (
            fact.join(dim, "k")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.round(F.sum(F.col("v") + F.col("w")), 2).alias("s"),
            )
        )

    def timed(build):
        t0 = time.monotonic()
        row = build().collect()[0]
        return time.monotonic() - t0, (row["c"], row["s"])

    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_off, r_off = timed(joined_plain)
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe, r_aqe = timed(joined_plain)
    t_salt, r_salt = timed(
        lambda: salted_join(fact, dim, "k", n_salts=32).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum(F.col("v") + F.col("w")), 2).alias("s"),
        )
    )
    print(
        json.dumps(
            {
                "rows": n,
                "hot_frac": hot_frac,
                "skew_off_sec": round(t_off, 3),
                "aqe_skew_sec": round(t_aqe, 3),
                "salted_sec": round(t_salt, 3),
                "aqe_speedup": round(t_off / t_aqe, 2),
                "salted_speedup": round(t_off / t_salt, 2),
                "results_match": (
                    r_off[0] == r_aqe[0] == r_salt[0]
                    and abs(r_off[1] - r_aqe[1]) < 0.05
                    and abs(r_off[1] - r_salt[1]) < 0.05
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
