"""DELETE containment split: stats-proven files drop wholesale
(metadata-only partition delete), boundary files still probe+rewrite."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.delete import delete_where
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id", "ingest_date"]
N = 160
DATES = 4


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    df = generate_images(spark, N, n_files=8).repartitionByRange(
        DATES, "ingest_date"
    )
    t.commit("append", t.write_files(df))
    return t


def test_partition_delete_is_metadata_only(table, spark):
    n_day = table.scan(
        spark, predicates=[("ingest_date", "=", "2024-01-02")]
    ).count()
    assert n_day > 0
    snap = delete_where(table, spark, [("ingest_date", "=", "2024-01-02")])
    assert snap.summary["rows_deleted"] == n_day
    assert snap.summary["files_dropped_wholesale"] >= 1
    assert snap.summary["files_rewritten"] == 0  # homogeneous: zero rewrites
    assert table.scan(spark).count() == N - n_day
    assert (
        table.scan(spark, predicates=[("ingest_date", "=", "2024-01-02")])
        .count()
        == 0
    )
    # snapshot isolation: parent still reads the deleted partition
    assert (
        table.scan(spark, snapshot_id=snap.parent_snapshot_id).count() == N
    )


def test_range_delete_mixes_wholesale_and_rewrite(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "mx"), SCHEMA, stats_cols=STATS,
    )
    # phash-clustered files so a phash range covers some files fully and
    # straddles one boundary file
    df = generate_images(spark, N, n_files=1).repartitionByRange(
        8, "phash"
    ).sortWithinPartitions("phash")
    t.commit("append", t.write_files(df))
    man = t.manifest_pdf().sort_values("min_phash").reset_index(drop=True)
    assert len(man) == 8
    # cut inside file 2: files 0,1 fully covered, file 2 boundary
    cut = int(man.loc[2, "min_phash"]) + (
        int(man.loc[2, "max_phash"]) - int(man.loc[2, "min_phash"])
    ) // 2
    n_match = t.scan(spark).filter(F.col("phash") <= cut).count()
    snap = delete_where(t, spark, [("phash", "<=", cut)])
    assert snap.summary["rows_deleted"] == n_match
    assert snap.summary["files_dropped_wholesale"] >= 2
    assert snap.summary["files_rewritten"] >= 1
    assert t.scan(spark).count() == N - n_match
    assert t.scan(spark).filter(F.col("phash") <= cut).count() == 0


def test_delete_cdc_still_exact_after_wholesale_drop(table, spark):
    s0 = table.metadata().current_snapshot_id
    n_day = table.scan(
        spark, predicates=[("ingest_date", "=", "2024-01-02")]
    ).count()
    delete_where(table, spark, [("ingest_date", "=", "2024-01-02")])
    cdc = table.changes_cdc(spark, s0)
    kinds = {
        r["_change_type"]: r["n"]
        for r in cdc.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert kinds.get("delete", 0) == n_day
    assert kinds.get("insert", 0) == 0
