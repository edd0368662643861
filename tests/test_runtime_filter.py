"""Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter).

Scale rationale: when a selective dimension filter feeds a shuffle join,
Spark can build a bloom filter from the dim side at runtime and push it
into the fact-side SCAN — rows that can't join are dropped before the
shuffle. This is the Spark analogue of the reference evaluating the join
predicate's partition eliminations on the PM before sending blocks to
the UM (casual partitioning + joblist small-side filters). At 100 TB the
pruned shuffle is the difference between scanning 100 TB and shipping
a fraction of it.

The thresholds default to cluster scale (application side > 10 GB), so
the test lowers them to fixture scale to prove the rewrite fires.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def tables(spark, tmp_path):
    fact = spark.range(200_000).select(
        F.col("id").alias("fk"), (F.col("id") % 1000).alias("k")
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("cat")
    )
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact.write.parquet(fp)
    dim.write.parquet(dp)
    return fp, dp


def test_bloom_filter_injected_on_selective_join(spark, tables):
    fp, dp = tables
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        # force a shuffle join so the runtime filter is worth injecting
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fp)
        dim = spark.read.parquet(dp).where(F.col("cat") == 3)
        joined = fact.join(dim, "k").groupBy().count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, (
            "runtime bloom filter was not injected:\n" + plan[:2000]
        )
        # and the result is still correct: 1000/10 dim keys × 200 fact
        # rows per key
        assert joined.collect()[0][0] == 100 * 200
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
