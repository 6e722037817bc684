"""add_files: zero-rewrite adoption of external parquet (Iceberg's
``add_files`` migration procedure). The reference's bronze layer keeps
raw files in place and registers them in Glue
(/root/reference/scripts/bronze_digit.py); this is the engine analogue —
link + stats + append commit, no payload rewrite."""

import os

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "image_id"],
    )
    t.commit("append", t.write_files(generate_images(spark, 50, n_files=2)))
    return t


@pytest.fixture()
def external_dir(tmp_path, spark):
    d = str(tmp_path / "external")
    generate_images(spark, 30, n_files=2, start=10_000).write.parquet(d)
    return d


def test_add_files_registers_without_rewrite(table, spark, external_dir):
    src_files = sorted(
        f for f in os.listdir(external_dir) if f.endswith(".parquet")
    )
    src_inodes = {
        f: os.stat(os.path.join(external_dir, f)).st_ino for f in src_files
    }
    snap = table.add_files(spark, external_dir)
    assert snap.operation == "append"
    assert int(snap.summary["source_files"]) == 2
    assert table.scan(spark).count() == 80
    # originals untouched; imported files are hard LINKS (same inode)
    man = table.manifest_pdf()
    linked = [
        p for p in man["path"] if os.path.basename(p) in src_inodes
    ]
    assert len(linked) == 2
    for rel in linked:
        assert (
            os.stat(os.path.join(table.root, rel)).st_ino
            == src_inodes[os.path.basename(rel)]
        )


def test_add_files_stats_prune(table, spark, external_dir):
    table.add_files(spark, external_dir)
    # imported files carry manifest stats usable for pruning
    pruned = table.scan(
        spark, predicates=[("image_id", ">=", "img-000000010000")]
    )
    assert pruned.count() == 30
    man = table.manifest_pdf()
    assert man["min_image_id"].notna().all()


def test_add_files_explicit_list_and_mismatch(table, spark, external_dir, tmp_path):
    paths = [
        os.path.join(external_dir, f)
        for f in os.listdir(external_dir)
        if f.endswith(".parquet")
    ][:1]
    snap = table.add_files(spark, paths)
    assert int(snap.summary["source_files"]) == 1
    bad = str(tmp_path / "bad")
    generate_images(spark, 5, n_files=1).drop("caption").write.parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        table.add_files(spark, bad)
    with pytest.raises(ValueError, match="no parquet"):
        table.add_files(spark, [])


def test_add_files_onto_branch(table, spark, external_dir):
    table.create_branch("imports")
    table.add_files(spark, external_dir, branch="imports")
    assert table.scan(spark).count() == 50
    assert table.scan(spark, branch="imports").count() == 80
    payload = (
        table.scan(spark, branch="imports")
        .agg(F.sum(F.length("bytes")))
        .first()[0]
    )
    assert payload and payload > 0
