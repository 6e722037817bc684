"""Metadata tables: snapshots / history / files / partitions views."""

import pytest

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.metatables import (
    files_df,
    history_df,
    manifests_df,
    partitions_df,
    refs_df,
    register_metadata_views,
    snapshots_df,
)
from aws_medallion_datalake_spark.sources.tableformat import Table


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "image_id"],
    )
    t.commit("append", t.write_files(generate_images(spark, 120, n_files=4, n_dates=2)))
    t.commit("append", t.write_files(generate_images(spark, 60, n_files=2, start=120)))
    return t


def test_snapshots_df(table, spark):
    rows = snapshots_df(table, spark).orderBy("snapshot_id").collect()
    assert [r.snapshot_id for r in rows] == [1, 2]
    assert [r.operation for r in rows] == ["append", "append"]
    assert rows[0].parent_snapshot_id is None and rows[1].parent_snapshot_id == 1
    assert rows[1].committed_at >= rows[0].committed_at
    # summary is a string map usable from SQL
    assert int(rows[1].summary["total_records"]) == 180


def test_files_matches_manifest(table, spark):
    f = files_df(table, spark)
    man = table.manifest_pdf()
    assert f.count() == len(man)
    got = f.groupBy().sum("record_count").first()[0]
    assert got == man["record_count"].sum() == 180
    assert {"min_phash", "max_phash", "nulls_image_id"} <= set(f.columns)


def test_partitions_rollup(table, spark):
    parts = {r.partition: r for r in partitions_df(table, spark).collect()}
    man = table.manifest_pdf()
    assert set(parts) == set(man["partition_json"])
    for pj, r in parts.items():
        sub = man[man["partition_json"] == pj]
        assert r.file_count == len(sub)
        assert r.record_count == sub["record_count"].sum()
        assert r.total_bytes == sub["file_size_bytes"].sum()


def test_history_marks_rollback_branch(table, spark):
    table.rollback(1)
    table.commit("append", table.write_files(generate_images(spark, 30, n_files=1, start=500)))
    hist = {r.snapshot_id: r for r in history_df(table, spark).collect()}
    # snapshot 2 was abandoned by the rollback; 3 branches from 1
    assert hist[3].parent_snapshot_id == 1
    assert hist[1].is_current_ancestor and hist[3].is_current_ancestor
    assert not hist[2].is_current_ancestor


def test_manifests_footer_only(table, spark):
    m = manifests_df(table, spark).collect()
    # two append commits -> delta manifest list of 2 entries
    assert len(m) == 2
    assert sum(r.entry_count for r in m) == len(table.manifest_pdf())
    assert all(r.file_size_bytes > 0 for r in m)
    # historical snapshot: only its own manifest list
    m1 = manifests_df(table, spark, snapshot_id=1).collect()
    assert {r.snapshot_id for r in m1} == {1}
    assert len(m1) == 1


def test_refs_tags_and_main(table, spark):
    table.tag("audit_v1", snapshot_id=1)
    refs = {r.name: (r.type, r.snapshot_id) for r in refs_df(table, spark).collect()}
    assert refs["main"] == ("branch", table.metadata().current_snapshot_id)
    assert refs["audit_v1"] == ("tag", 1)


def test_register_metadata_views_sql(table, spark):
    register_metadata_views(table, spark, "img")
    n = spark.sql(
        "SELECT sum(record_count) FROM img_partitions"
    ).first()[0]
    assert n == 180
    ops = spark.sql(
        "SELECT count(*) FROM img_snapshots WHERE operation = 'append'"
    ).first()[0]
    assert ops == 2
    top = spark.sql(
        "SELECT path FROM img_files ORDER BY record_count DESC LIMIT 1"
    ).first()
    assert top.path.endswith(".parquet")
    ec = spark.sql("SELECT sum(entry_count) FROM img_manifests").first()[0]
    assert ec == len(table.manifest_pdf())
    head = spark.sql(
        "SELECT snapshot_id FROM img_refs WHERE name = 'main'"
    ).first()[0]
    assert head == table.metadata().current_snapshot_id


def test_delete_files_metatable(tmp_path, spark):
    from aws_medallion_datalake_spark.operators.delete import (
        delete_where,
        equality_delete,
    )
    from aws_medallion_datalake_spark.sources.generator import (
        SCHEMA,
        generate_images,
    )
    from aws_medallion_datalake_spark.sources.metatables import delete_files_df
    from aws_medallion_datalake_spark.sources.tableformat import Table

    t = Table.create(
        str(tmp_path / "df"), SCHEMA,
        stats_cols=["phash", "image_id", "w"],
    )
    t.commit("append", t.write_files(generate_images(spark, 60, n_files=2)))
    assert delete_files_df(t, spark).count() == 0
    import pyspark.sql.functions as F

    lo = t.scan(spark).agg(F.min("phash")).first()[0]
    delete_where(t, spark, [("phash", "<=", lo)], mode="merge-on-read")
    ids = [r["image_id"] for r in t.scan(spark).limit(2).collect()]
    equality_delete(t, spark, ids, cols=["image_id"])
    inv = delete_files_df(t, spark)
    kinds = {r["kind"]: r for r in inv.collect()}
    assert set(kinds) == {"position", "equality"}
    assert kinds["position"]["record_count"] >= 1
    assert kinds["equality"]["eq_cols"] == ["image_id"]
    assert kinds["equality"]["as_of_snapshot_id"] is not None
