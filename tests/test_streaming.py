"""Structured-Streaming parity: stream(availableNow) == batch on the same
input, for windowed counts and sessionization."""

from __future__ import annotations

import pyspark.sql.functions as F

from mariadb_columnstore_engine_spark.catalog import Catalog
from mariadb_columnstore_engine_spark.streaming import pipeline


def _stage_events(spark, sf_dir, tmp_path) -> str:
    """Write the fixture events (ts normalized to µs) as a streamable dir."""
    src = str(tmp_path / "events_stream_src")
    Catalog(spark, sf_dir).events.repartition(4).write.parquet(src)
    return src


def test_stream_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = pipeline.windowed_counts(pipeline.read_event_stream(spark, src))
    pipeline.run_available_now(
        stream,
        checkpoint=str(tmp_path / "ckpt_win"),
        query_name="win_counts",
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected_df = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in expected_df.collect()
    }
    assert got == expected


def test_stream_sessionization_runs(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = pipeline.sessionized(pipeline.read_event_stream(spark, src))
    pipeline.run_available_now(
        stream,
        checkpoint=str(tmp_path / "ckpt_sess"),
        query_name="sessions",
    )
    rows = spark.sql(
        "SELECT count(*) AS n, sum(n_events) AS tot FROM sessions"
    ).collect()[0]
    n_events = spark.read.parquet(src).count()
    assert rows.tot == n_events, "every event must land in exactly 1 session"
    assert rows.n > 0
