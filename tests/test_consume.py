"""Bookmark-checkpointed incremental consumer over table changes."""

from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.operators.compact import compact
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
    generate_updates,
)
from aws_medallion_datalake_spark.sources.tableformat import Table
from aws_medallion_datalake_spark.streaming import (
    consume_changes,
    last_consumed_snapshot,
)

STATS = ["phash", "w", "h", "image_id"]
N = 200


def test_consume_changes_exactly_once(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=4)))
    ckpt = str(tmp_path / "consumer.jsonl")

    # fresh checkpoint: the whole current snapshot is the first batch
    r1 = consume_changes(t, spark, ckpt)
    assert r1["rows"] == N and r1["from_snapshot"] is None
    assert last_consumed_snapshot(ckpt) == r1["to_snapshot"]
    # caught up
    assert consume_changes(t, spark, ckpt) is None

    # append + merge: next batch = appended rows + merge delta only
    t.commit("append", t.write_files(generate_images(spark, 50, n_files=2, start=9000)))
    merge_into(t, spark, generate_updates(spark, N, 20, 10, n_files=1))
    r2 = consume_changes(t, spark, ckpt)
    assert r2["rows"] == 50 + 30  # appends + (20 upd + 10 ins) delta
    assert r2["from_snapshot"] == r1["to_snapshot"]

    # physical-only commits advance the bookmark but emit nothing
    compact(t, spark, target_file_size_bytes=64 * 1024 * 1024)
    r3 = consume_changes(t, spark, ckpt)
    assert r3 is not None and r3["rows"] == 0
    assert consume_changes(t, spark, ckpt) is None


def test_consume_handler_failure_replays_range(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )
    t.commit("append", t.write_files(generate_images(spark, 40, n_files=2)))
    ckpt = str(tmp_path / "consumer.jsonl")

    def boom(df, frm, to):
        raise RuntimeError("sink down")

    try:
        consume_changes(t, spark, ckpt, boom)
    except RuntimeError:
        pass
    # bookmark did NOT advance → the same range replays (at-least-once)
    assert last_consumed_snapshot(ckpt) is None
    got = consume_changes(t, spark, ckpt, lambda df, frm, to: df.count())
    assert got["result"] == 40


def test_consume_start_snapshot_skips_history(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )
    t.commit("append", t.write_files(generate_images(spark, 40, n_files=2)))
    s1 = t.metadata().current_snapshot_id
    t.commit("append", t.write_files(generate_images(spark, 25, n_files=1, start=5000)))
    ckpt = str(tmp_path / "consumer.jsonl")
    r = consume_changes(t, spark, ckpt, start_snapshot_id=s1)
    assert r["rows"] == 25  # history before s1 skipped


def test_consume_cdc_mode(tmp_path, spark):
    """cdc=True feeds changelog batches: updates arrive as delete+insert,
    deletes as delete rows; fresh checkpoint = snapshot-as-inserts."""
    from pyspark.sql import functions as F

    from aws_medallion_datalake_spark.operators.delete import delete_where

    t = Table.create(
        str(tmp_path / "t"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=4)))
    ckpt = str(tmp_path / "cdc_consumer.jsonl")

    r1 = consume_changes(t, spark, ckpt, cdc=True)
    assert r1["rows"] == N and r1["from_snapshot"] is None

    merge_into(t, spark, generate_updates(spark, N, 15, 5, n_files=1))
    victim = t.scan(spark).select("image_id").head()[0]
    delete_where(t, spark, [("image_id", "=", victim)])

    seen = {}

    def collect(df, frm, to):
        for r in df.groupBy("_change_type").count().collect():
            seen[r["_change_type"]] = r["count"]
        return df.count()

    r2 = consume_changes(t, spark, ckpt, collect, cdc=True)
    # merge: 15 updates -> 15 del + 15 ins, 5 inserts; CoW delete: 1 del
    assert seen == {"insert": 20, "delete": 16}
    assert r2["result"] == 36
    assert consume_changes(t, spark, ckpt, cdc=True) is None
