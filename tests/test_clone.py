"""SHALLOW CLONE: zero-copy independent table from a snapshot's file set
(Delta CREATE TABLE … SHALLOW CLONE analogue) — hard links + manifest
reuse, no Spark job."""

import os

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import (
    compact,
    delete_where,
    expire_snapshots,
    merge_into,
)
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
    generate_updates,
)
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id"]


def make(tmp_path, spark, n=200, n_files=8) -> Table:
    t = Table.create(
        str(tmp_path / "src"), schema_ddl=SCHEMA,
        partition_cols=["ingest_date"], stats_cols=STATS,
        properties={"write.merge.mode": "copy-on-write"},
    )
    t.commit("append", t.write_files(generate_images(spark, n, n_files=n_files)))
    return t


def test_clone_matches_source(tmp_path, spark):
    t = make(tmp_path, spark)
    c = t.clone(str(tmp_path / "dst"))
    assert c.scan(spark).count() == 200
    assert (
        c.scan(spark)
        .select("image_id", "caption")
        .exceptAll(t.scan(spark).select("image_id", "caption"))
        .isEmpty()
    )
    # manifest stats reused verbatim, files hard-linked (same inode)
    src_man, dst_man = t.manifest_pdf(), c.manifest_pdf()
    assert list(src_man["record_count"]) == list(dst_man["record_count"])
    s0 = os.stat(os.path.join(t.root, src_man["path"].iloc[0]))
    d0 = os.stat(os.path.join(c.root, dst_man["path"].iloc[0]))
    assert s0.st_ino == d0.st_ino
    # properties carried over
    assert c.metadata().properties["write.merge.mode"] == "copy-on-write"


def test_clone_is_independent(tmp_path, spark):
    t = make(tmp_path, spark)
    c = t.clone(str(tmp_path / "dst"))
    merge_into(t, spark, generate_updates(spark, 200, n_updates=40, n_inserts=20))
    assert t.scan(spark).count() == 220
    assert c.scan(spark).count() == 200  # clone untouched
    compact(c, spark)
    expire_snapshots(c, keep_last=1)
    # source still reads all its rows even after clone-side GC
    assert t.scan(spark).count() == 220
    assert c.scan(spark).count() == 200


def test_clone_of_old_snapshot(tmp_path, spark):
    t = make(tmp_path, spark)
    s0 = t.snapshot().snapshot_id
    t.commit("append", t.write_files(generate_images(spark, 50, n_files=2, start=900)))
    c = t.clone(str(tmp_path / "dst"), snapshot_id=s0)
    assert c.scan(spark).count() == 200


def test_clone_refuses_pending_deletes(tmp_path, spark):
    t = make(tmp_path, spark)
    a_date = t.scan(spark).select("ingest_date").first()["ingest_date"]
    delete_where(t, spark, [("ingest_date", "=", a_date)], mode="merge-on-read")
    with pytest.raises(ValueError, match="pending merge-on-read"):
        t.clone(str(tmp_path / "dst"))


def test_sql_shallow_clone(tmp_path, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    t = make(tmp_path, spark)
    eng = EngineSQL(spark, {"images": t})
    res = eng.sql(
        f"CREATE TABLE mirror SHALLOW CLONE images "
        f"LOCATION '{tmp_path / 'mirror'}'"
    ).first()
    assert res["files_linked"] > 0
    assert (
        eng.sql("SELECT count(*) AS n FROM mirror").first()["n"] == 200
    )
