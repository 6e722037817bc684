"""Structured Streaming ingest into the engine's table format.

The reference's "streaming" is batch-with-watermark (daily D-1 windows,
DynamoDB cursor — SURVEY.md §2.9 T1/T2). This module provides the
Spark-native upgrade path the north_star architecture implies:

- ``stream_append``: ``readStream`` (file source) → ``foreachBatch`` →
  ``Table.commit("append")``. Exactly-once into OUR format: Structured
  Streaming's checkpoint replays a failed micro-batch with the SAME
  batch_id, and the commit hook skips batch ids already recorded in a
  snapshot summary — the same idempotence contract Delta's
  ``txnAppId``/``txnVersion`` sink options implement.
- ``windowed_event_rollup``: watermarked tumbling-window aggregation for
  late data (the gold-layer continuous variant of the reference's daily
  rollups).

Tested with ``trigger(availableNow=True)`` so the pipeline drains a
directory and stops — same code path a 24/7 cluster deployment runs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tableformat import Table


def committed_batch_ids(table: Table) -> set:
    """Streaming batch ids already durably committed to this table."""
    return {
        s.summary.get("stream_batch_id")
        for s in table.metadata().snapshots
        if s.summary.get("stream_batch_id") is not None
    }


def stream_append(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    checkpoint_dir: str,
    *,
    schema_ddl: Optional[str] = None,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Continuously append parquet files landing in ``source_dir``.

    Returns the StreamingQuery (call ``awaitTermination()``)."""
    meta = table.metadata()
    reader = spark.readStream.schema(schema_ddl or meta.schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    done = committed_batch_ids(table)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in done:  # replayed after failure → already durable
            return
        if batch_df.isEmpty():
            return
        entries = table.write_files(batch_df)
        table.commit(
            "append",
            entries,
            {"stage": "stream-append", "stream_batch_id": int(batch_id)},
        )
        done.add(batch_id)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_rollup(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup (streaming OR batch DataFrame):
    per (window, event_type) counts and value sums; late rows beyond the
    watermark are dropped instead of growing state forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
