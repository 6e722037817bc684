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


def test_sessionize_stream_matches_batch(tmp_path, spark):
    """The applyInPandasWithState sessionizer must agree with the pure
    window-algebra batch twin: in a single availableNow micro-batch every
    session except each key's LAST (still open, no watermark to close it)
    is provably closed and emitted."""
    import datetime as dt

    from aws_medallion_datalake_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    # user 1: sessions {0,5,10}, {60,65}, {200}; user 2: {0}, {100} (gap=30m)
    for m in (0, 5, 10, 60, 65, 200):
        rows.append((1, base + dt.timedelta(minutes=m), 1.5))
    for m in (0, 100):
        rows.append((2, base + dt.timedelta(minutes=m), 2.0))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    src = str(tmp_path / "sess_src")
    df.repartition(1).write.parquet(src)

    batch = sessionize_batch(spark.read.parquet(src), gap_minutes=30).collect()
    assert len(batch) == 5

    stream = spark.readStream.schema("user_id bigint, ts timestamp, value double").parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.table("sess_sink").collect()
    }
    # expected closed = all batch sessions minus each key's latest
    by_key = {}
    for r in batch:
        by_key.setdefault(r.user_id, []).append(r)
    expected = set()
    for rs in by_key.values():
        rs.sort(key=lambda r: r.session_start)
        for r in rs[:-1]:
            expected.add((r.user_id, r.session_start, r.session_end, r.n_events, r.total_value))
    assert got == expected
    assert len(got) == 3  # user1 closes 2 sessions, user2 closes 1
