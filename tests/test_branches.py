"""Branch refs: independently-advancing named heads (Iceberg branches).

The reference has a single linear table state per Glue catalog entry;
branches extend the engine's refs model (tags + WAP staging) to full
audit-branch workflows: cut a branch, land commits on it invisibly, gate,
then fast-forward main. SURVEY.md §2.11.
"""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.expire import expire_snapshots
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.metatables import refs_df
from aws_medallion_datalake_spark.sources.tableformat import Table


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "image_id"],
    )
    t.commit("append", t.write_files(generate_images(spark, 100, n_files=2)))
    return t


def _append(t, spark, n, start, branch=None):
    return t.commit(
        "append",
        t.write_files(generate_images(spark, n, n_files=1, start=start)),
        branch=branch,
    )


def test_branch_commits_are_invisible_to_main(table, spark):
    table.create_branch("audit")
    _append(table, spark, 40, 10_000, branch="audit")
    _append(table, spark, 20, 20_000, branch="audit")
    # main still reads the pre-branch table; the branch sees its commits
    assert table.scan(spark).count() == 100
    assert table.scan(spark, branch="audit").count() == 160
    assert table.branches() == {"audit": table.branch_head("audit")}
    # branch head parents chain back onto the cut point
    head = table.snapshot(table.branch_head("audit"))
    assert table.snapshot(head.parent_snapshot_id).parent_snapshot_id == 1


def test_branch_and_main_advance_independently(table, spark):
    table.create_branch("exp", snapshot_id=1)
    _append(table, spark, 30, 10_000, branch="exp")
    _append(table, spark, 50, 30_000)  # main commit
    assert table.scan(spark).count() == 150
    assert table.scan(spark, branch="exp").count() == 130
    # a main commit must not move the branch pointer, and vice versa
    assert int(table.snapshot(table.branch_head("exp")).summary["total_records"]) == 130


def test_fast_forward_publishes_branch(table, spark):
    table.create_branch("audit")
    _append(table, spark, 40, 10_000, branch="audit")
    n_snaps = len(table.metadata().snapshots)
    head = table.fast_forward("audit")
    # metadata-only: no new snapshot, main now at the branch head
    assert len(table.metadata().snapshots) == n_snaps
    assert table.metadata().current_snapshot_id == head.snapshot_id
    assert table.scan(spark).count() == 140
    # branch keeps existing and can keep advancing past main
    _append(table, spark, 10, 50_000, branch="audit")
    assert table.scan(spark).count() == 140
    assert table.scan(spark, branch="audit").count() == 150


def test_fast_forward_refuses_diverged_main(table, spark):
    table.create_branch("audit")
    _append(table, spark, 40, 10_000, branch="audit")
    _append(table, spark, 5, 30_000)  # main diverges
    with pytest.raises(ValueError, match="diverged"):
        table.fast_forward("audit")


def test_expire_keeps_branch_reachable_files(table, spark):
    table.create_branch("audit")
    _append(table, spark, 40, 10_000, branch="audit")
    _append(table, spark, 5, 30_000)  # main moves on
    expire_snapshots(table, keep_last=1)
    # branch head survived expiry and reads all its data files
    b = table.scan(spark, branch="audit")
    assert b.count() == 140
    assert b.filter(F.col("image_id") >= "img-000000010000").count() == 40


def test_drop_branch_releases_files_to_gc(table, spark):
    import os

    table.create_branch("audit")
    snap = _append(table, spark, 40, 10_000, branch="audit")
    man = table.manifest_pdf(snap.snapshot_id)
    delta = [
        os.path.join(table.root, p)
        for p in man[~man["path"].isin(table.manifest_pdf()["path"])]["path"]
    ]
    assert delta
    _append(table, spark, 5, 30_000)  # main moves past the branch commit
    expire_snapshots(table, keep_last=1)
    assert all(os.path.exists(p) for p in delta)  # branch pins its delta
    table.drop_branch("audit")
    expire_snapshots(table, keep_last=1)
    assert not any(os.path.exists(p) for p in delta)  # abandoned delta GC'd
    assert table.scan(spark).count() == 105
    with pytest.raises(KeyError):
        table.branch_head("audit")


def test_branch_errors(table, spark):
    table.create_branch("a")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("a")
    with pytest.raises(KeyError):
        table.create_branch("b", snapshot_id=99)
    with pytest.raises(KeyError):
        table.commit("append", table.manifest_pdf().iloc[:0], branch="nope")
    with pytest.raises(ValueError, match="exclusive"):
        table.scan(spark, snapshot_id=1, branch="a")


def test_refs_df_lists_branches(table, spark):
    table.create_branch("audit")
    table.tag("v1")
    refs = {r.name: (r.type, r.snapshot_id) for r in refs_df(table, spark).collect()}
    assert refs["audit"] == ("branch", 1)
    assert refs["v1"] == ("tag", 1)
    assert refs["main"] == ("branch", 1)
