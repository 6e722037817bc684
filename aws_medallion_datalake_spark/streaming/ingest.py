"""Structured Streaming ingest into the engine's table format.

The reference's "streaming" is batch-with-watermark (daily D-1 windows,
DynamoDB cursor — SURVEY.md §2.9 T1/T2). This module provides the
Spark-native upgrade path the north_star architecture implies:

- ``stream_append``: ``readStream`` (file source) → ``foreachBatch`` →
  ``Table.commit("append")``. Exactly-once into OUR format with Delta's
  ``txnAppId``/``txnVersion`` contract: idempotence is scoped PER STREAM
  (app id defaults to a digest of the checkpoint path), and the latest
  committed batch id per app is persisted in table PROPERTIES in the
  same atomic metadata commit as the data — so (a) a different stream /
  fresh checkpoint over new files is never conflated with an old
  stream's batch numbering, and (b) ``expire_snapshots`` can prune every
  old snapshot without re-opening replay windows (properties survive
  expiry; snapshot summaries do not).
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

from ..sources.tableformat import Table, TxnAlreadyCommittedError


def _txn_prop(app_id: str) -> str:
    return f"stream.txn.{app_id}"


def default_app_id(checkpoint_dir: str) -> str:
    """Stable per-checkpoint stream identity (Delta's txnAppId analogue):
    restarts of the same checkpoint share it; a fresh checkpoint gets a
    new one, so batch numbering is never conflated across streams."""
    import hashlib
    import os

    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]


def last_committed_batch(table: Table, app_id: str) -> int:
    """Latest micro-batch id this stream durably committed (−1 if none).
    Stored in table properties — NOT in snapshot summaries — so snapshot
    expiry can never re-open a replay window."""
    return int(table.metadata().properties.get(_txn_prop(app_id), -1))


def exactly_once_append(
    table: Table, app_id: str, batch_id: int, batch_df: DataFrame
) -> bool:
    """Commit one micro-batch idempotently (txnAppId/txnVersion rule:
    skip iff batch_id ≤ last committed version for THIS app). Returns
    True if committed, False if skipped as a duplicate replay."""
    if batch_id <= last_committed_batch(table, app_id):
        return False  # replayed after failure → already durable
    entries = table.write_files(batch_df)
    try:
        table.commit(
            "append",
            entries,
            {
                "stage": "stream-append",
                "stream_app_id": app_id,
                "stream_batch_id": int(batch_id),
            },
            properties={_txn_prop(app_id): int(batch_id)},
            # re-validated inside the metadata CAS: concurrent replays of
            # the same (appId, batchId) cannot both land
            txn=(_txn_prop(app_id), int(batch_id)),
        )
    except TxnAlreadyCommittedError:
        return False
    return True


def stream_append(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    checkpoint_dir: str,
    *,
    app_id: Optional[str] = None,
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
    app = app_id or default_app_id(checkpoint_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        exactly_once_append(table, app, batch_id, batch_df)

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
