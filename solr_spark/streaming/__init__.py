"""Continuous processing — the reference's commit-visibility model on
Structured Streaming.

The reference has no event-time watermarks or late-data semantics
(SURVEY.md §2.9): visibility is commit-based micro-batching. Mapping:

| reference                              | here                          |
|----------------------------------------|-------------------------------|
| daemon() recurring query loop          | daemon_run / foreachBatch     |
|   (solrj-streaming/.../io/stream/DaemonStream.java:50-86)             |
| topic() incremental consumption        | sources.topic_read (batch HWM)|
|   (solrj-streaming/.../io/stream/TopicStream.java:75-111)             |
| soft/hard commit micro-batches         | writeStream per-batch parquet |
|   (core/.../update/DirectUpdateHandler2.java:105-146 CommitTracker)   |
| timeseries() tumbling buckets          | window(ts, gap) (+ watermark  |
|   (TimeSeriesStream.java:52-100)       |  — a Spark-only upgrade)      |
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daemon_run(
    fn: Callable[[int], None], run_interval_s: float, iterations: int
) -> int:
    """daemon(): re-run a query on a fixed interval
    (DaemonStream.java:50-86 — runInterval loop with an internal queue).
    Bounded by ``iterations`` so tests terminate; production would loop
    until cancelled. Returns the number of completed runs."""
    done = 0
    for i in range(iterations):
        fn(i)
        done += 1
        if i + 1 < iterations:
            time.sleep(run_interval_s)
    return done


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str,
    gap: str,
    watermark: str,
    metrics: list,
) -> DataFrame:
    """Streaming timeseries(): file-source readStream → watermarked
    tumbling-window aggregation. The watermark + late-data handling is a
    capability the reference lacks (commit-visibility only) — a
    Spark-native upgrade, kept to the same bucket semantics as the batch
    rollup.timeseries()."""
    src = spark.readStream.schema(schema).parquet(source_dir)
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, gap).alias("__w"))
        .agg(*metrics)
        .withColumn("bucket_start", F.col("__w.start"))
        .drop("__w")
    )


def run_stream_once(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """Drain all available input as micro-batches (trigger availableNow),
    committing each batch — the CommitTracker cadence
    (DirectUpdateHandler2.java:105-146) under Spark's exactly-once
    checkpointing."""
    q = (
        stream_df.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
