"""Merge-on-read MERGE: delta append + positional deletes for matched
rows — O(changes) IO, no data-file rewrites."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import apply_deletes, compact
from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=["phash"],
    )
    t.commit("append", t.write_files(generate_images(spark, 120, n_files=4)))
    return t


def test_mor_merge_update(table, spark):
    t = table
    before_paths = set(t.manifest_pdf()["path"])
    src = generate_images(spark, 40, n_files=1, start=100).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )  # 20 matched + 20 new
    s = merge_into(t, spark, src, key="image_id", mode="merge-on-read")
    assert s.summary["mode"] == "merge-on-read"
    assert s.summary["rows_updated"] == 20 and s.summary["rows_inserted"] == 20
    assert s.summary["files_rewritten"] == 0
    # data files: originals untouched, only delta files added
    after_paths = set(t.manifest_pdf()["path"])
    assert before_paths <= after_paths
    assert t.pending_delete_paths()
    # logical state identical to a copy-on-write merge
    assert t.scan(spark).count() == 140
    assert (
        t.scan(spark).filter(F.col("caption").endswith("-v2")).count() == 40
    )
    got = t.scan(spark).groupBy().agg(F.countDistinct("image_id")).first()[0]
    assert got == 140
    # rewrites are guarded until the deletes are materialized
    with pytest.raises(ValueError, match="pending"):
        compact(t, spark, target_file_size_bytes=8 * 1024 * 1024)
    apply_deletes(t, spark)
    assert t.scan(spark).count() == 140 and not t.pending_delete_paths()


def test_mor_merge_delete_mode(table, spark):
    t = table
    src = generate_images(spark, 30, n_files=1, start=110)  # 10 matched + 20 new
    s = merge_into(
        t, spark, src, key="image_id", mode="merge-on-read", when_matched="delete"
    )
    assert s.summary["rows_deleted"] == 10 and s.summary["rows_inserted"] == 20
    assert t.scan(spark).count() == 120 - 10 + 20
    # the matched keys are gone, the unmatched source keys landed
    assert (
        t.scan(spark)
        .filter(F.col("image_id") == "img-%012d" % 110)
        .count()
        == 0
    )
    assert (
        t.scan(spark).filter(F.col("image_id") == "img-%012d" % 130).count() == 1
    )


def test_mor_merge_cdc_and_changes(table, spark):
    t = table
    sid0 = t.metadata().current_snapshot_id
    src = generate_images(spark, 25, n_files=1, start=110).withColumn(
        "w", F.col("w") + F.lit(3)
    )  # 10 matched + 15 new
    merge_into(t, spark, src, key="image_id", mode="merge-on-read")
    # incremental read: exactly the delta
    assert t.changes(spark, sid0).count() == 25
    cdc = t.changes_cdc(spark, sid0)
    by = {r["_change_type"]: r["count"] for r in cdc.groupBy("_change_type").count().collect()}
    assert by == {"insert": 25, "delete": 10}
    # replay invariant: base + inserts - deletes == final count
    assert 120 + 25 - 10 == t.scan(spark).count()


def test_mor_merge_stacks_on_pending_deletes(table, spark):
    from aws_medallion_datalake_spark.operators import delete_where

    t = table
    victim = "img-%012d" % 5
    delete_where(t, spark, [("image_id", "=", victim)], mode="merge-on-read")
    src = generate_images(spark, 10, n_files=1, start=5).withColumn(
        "caption", F.lit("fresh")
    )  # includes the already-deleted key
    merge_into(t, spark, src, key="image_id", mode="merge-on-read")
    # the dead row was not re-recorded; the merge re-inserts the key
    assert t.scan(spark).filter(F.col("image_id") == victim).count() == 1
    assert (
        t.scan(spark).filter(F.col("image_id") == victim).head()["caption"]
        == "fresh"
    )
    assert t.scan(spark).count() == 120  # 119 visible + 10 upserts - 9 dupes
    apply_deletes(t, spark)
    assert t.scan(spark).count() == 120
