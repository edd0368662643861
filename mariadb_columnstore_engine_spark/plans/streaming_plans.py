"""Registry rows that run Structured Streaming end-to-end (r11).

The reference is a batch-only OLAP engine (SURVEY §2.10), so streaming
is Spark-native surface; until r11 its evidence was pytest-only
(tests/test_streaming.py asserts stream == batch). This module gives
the streaming path DRIVER evidence: the row below executes a real
incremental pipeline — file-source ``readStream`` over multiple
micro-batches (maxFilesPerTrigger), watermarked event-time tumbling
aggregation, memory sink drained with ``availableNow`` — and returns
the sink table, which the driver oracle-checks against the plain
batch SQL. On bounded input the unified Dataset API guarantees the
incremental answer equals the batch answer; this row makes that
guarantee a measured fact every round instead of a cited one.

Exactness discipline: value sums are carried as integer cents
(round(value*100) → BIGINT) exactly like the batch twin
``events_tumbling_window`` — float sums across micro-batch
accumulation orders would straddle any rounding grid.

Scale notes (100 TB lens): the watermark bounds state to
(horizon × #event_type × #windows-in-horizon); the memory sink is the
TEST harness only — a deployment writes to parquet/Kafka. The
pre-write of the source directory normalizes the driver fixture's
TIMESTAMP(NANOS) to µs once, the same normalization the batch catalog
applies at read time.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.plans.registry import query


@query(
    "stream_tumbling_window_counts",
    section="§2.10 streaming (driver-evidenced, r11): incremental "
    "file-source stream → watermarked tumbling window agg → "
    "availableNow memory sink; oracle is the equivalent batch SQL — "
    "stream == batch on bounded input, measured not cited.",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_window_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mariadb_columnstore_engine_spark.streaming.pipeline import (
        read_event_stream,
        run_available_now,
    )

    t = Catalog(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="mcs_stream_row_")
    src = os.path.join(work, "src")
    # µs-normalized source files; several files → several micro-batches
    # under maxFilesPerTrigger=4, so state genuinely accumulates across
    # triggers instead of one degenerate drain
    t.events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).repartition(8).write.parquet(src)

    stream = (
        read_event_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("total_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    run_available_now(
        stream,
        checkpoint=os.path.join(work, "ckpt"),
        query_name=name,
    )
    return spark.table(name).orderBy("window_start", "event_type")
