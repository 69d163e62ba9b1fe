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


def stream_index(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    **build_kw,
):
    """Continuous indexing: a file-source readStream drained with
    trigger(availableNow) where every micro-batch flushes as one
    immutable delta segment (segments.add_segment) — the streaming form
    of the reference's addDoc → segment-flush → commit lifecycle
    (DirectUpdateHandler2.java:309-409 + CommitTracker:105-146), with
    Spark's checkpointing as the transaction log.

    Idempotency: the segment manifest records which batch_ids have
    flushed; a replayed foreachBatch (checkpoint not yet committed when
    the driver died) is skipped, so a batch never double-indexes — the
    same replay-dedup contract as the reference's tlog version checks
    (UpdateLog.java:576-710).

    Returns the committed IndexView (None if no data arrived)."""
    import os

    from ..segments import add_segment, load_view, open_base, save_view

    os.makedirs(out_dir, exist_ok=True)
    src = spark.readStream.schema(schema).parquet(source_dir)

    def flush_batch(batch_df: DataFrame, batch_id: int) -> None:
        state = load_view(out_dir)
        view, done = state if state else (None, [])
        if batch_id in done:
            return  # replayed batch: already a committed segment
        if view is None:
            view = open_base(spark, batch_df, out_dir, **build_kw)
        else:
            # bucket_docs is pinned by the base segment; deltas inherit it
            delta_kw = {k: v for k, v in build_kw.items() if k != "bucket_docs"}
            view = add_segment(spark, view, batch_df, out_dir, **delta_kw)
        save_view(view, out_dir, done + [batch_id])

    q = (
        src.writeStream.foreachBatch(flush_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    state = load_view(out_dir)
    return state[0] if state else None


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
