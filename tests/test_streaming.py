"""Structured Streaming ingest: exactly-once appends + watermarked rollup."""

import os

from pyspark.sql import functions as F

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table
from aws_medallion_datalake_spark.streaming.ingest import (
    default_app_id,
    exactly_once_append,
    last_committed_batch,
    stream_append,
    windowed_event_rollup,
)

STATS = ["phash", "w", "h", "image_id"]


def _mk_table(tmp_path):
    return Table.create(
        str(tmp_path / "t"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )


def test_stream_append_drains_directory(tmp_path, spark):
    src = str(tmp_path / "incoming")
    generate_images(spark, 60, n_files=3).write.parquet(src)
    t = _mk_table(tmp_path)
    q = stream_append(
        spark, t, src, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert t.scan(spark).count() == 60
    assert last_committed_batch(t, default_app_id(str(tmp_path / "ckpt"))) >= 0
    # new files landing later are picked up by the next run, same checkpoint
    generate_images(spark, 20, n_files=1, start=60).write.mode("append").parquet(src)
    q2 = stream_append(spark, t, src, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert t.scan(spark).count() == 80


def test_stream_exactly_once_is_scoped_per_app(tmp_path, spark):
    """The Delta txnAppId/txnVersion contract (ADVICE r1): replaying a
    batch id within ONE stream is skipped, but a DIFFERENT stream
    (fresh checkpoint) reusing batch id 0 over new data must NOT be
    silently dropped — and snapshot expiry must not re-open the replay
    window, because the txn version lives in table properties."""
    t = _mk_table(tmp_path)
    batch_a = generate_images(spark, 30, n_files=1)
    assert exactly_once_append(t, "app-A", 0, batch_a) is True
    n1 = t.scan(spark).count()
    # same app, same batch id → duplicate replay after a crash between
    # table commit and checkpoint offset write → skipped
    assert exactly_once_append(t, "app-A", 0, batch_a) is False
    assert t.scan(spark).count() == n1 == 30
    # DIFFERENT app (fresh checkpoint), batch id 0, NEW files → must land
    batch_b = generate_images(spark, 20, n_files=1, start=1000)
    assert exactly_once_append(t, "app-B", 0, batch_b) is True
    assert t.scan(spark).count() == 50
    # expire every old snapshot; replay of (app-A, 0) must STILL skip
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots

    expire_snapshots(t, keep_last=1)
    assert exactly_once_append(t, "app-A", 0, batch_a) is False
    assert exactly_once_append(t, "app-B", 0, batch_b) is False
    assert t.scan(spark).count() == 50
    assert last_committed_batch(t, "app-A") == 0


def test_stream_replay_same_checkpoint_no_duplicates(tmp_path, spark):
    """End-to-end: re-running the drained stream with the SAME checkpoint
    appends nothing (no new batches, no duplicate rows)."""
    src = str(tmp_path / "incoming")
    generate_images(spark, 30, n_files=1).write.parquet(src)
    t = _mk_table(tmp_path)
    q = stream_append(spark, t, src, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    n1 = t.scan(spark).count()
    q2 = stream_append(spark, t, src, str(tmp_path / "ckpt1"))
    q2.awaitTermination(120)
    assert t.scan(spark).count() == n1 == 30


def test_windowed_rollup_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_rollup(events, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()
    # window bounds are aligned hours
    for r in rows[:10]:
        assert r["window_start"].minute == 0 and r["window_start"].second == 0


def test_windowed_rollup_streaming_mode(tmp_path, spark):
    """Same plan as a real stream: file source, availableNow, append mode
    with watermark — results land in a memory sink."""
    src = str(tmp_path / "ev")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(src)
    out = windowed_event_rollup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("rollup_sink")
    # append mode emits only windows sealed by the watermark; the final
    # (unsealed) windows stay in state, so emitted <= batch total
    batch_total = spark.read.parquet(src).count()
    emitted = got.agg(F.sum("n_events")).first()[0] or 0
    assert 0 < emitted <= batch_total
