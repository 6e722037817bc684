"""Write-audit-publish ingestion: stage → gate → publish/reject/drop."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.expire import remove_orphan_files
from aws_medallion_datalake_spark.pipeline.wap import gated_append, image_audit_gate
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id", "ingest_date"]


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA, partition_cols=["ingest_date"], stats_cols=STATS
    )
    t.commit("append", t.write_files(generate_images(spark, 100, n_files=4)))
    return t


def _strict_gate(delta):
    return image_audit_gate(delta, decode_sample_fraction=1.0)


def test_gated_append_publishes_clean_batch(table, spark):
    batch = generate_images(spark, 40, n_files=2, start=5000)
    r = gated_append(table, spark, batch, wap_id="b1", gate=_strict_gate)
    assert r["passed"] and r["published"]
    assert r["metrics"]["rows"] == 40
    assert r["metrics"]["decode_checked"] == 40
    assert r["metrics"]["decode_failures"] == 0
    assert table.scan(spark).count() == 140
    assert table.staged_snapshots() == []


def test_gated_append_rejects_corrupt_batch(table, spark):
    # truncate half the payloads: metadata still looks fine, only the
    # decode probe can see it
    batch = generate_images(spark, 40, n_files=2, start=5000).withColumn(
        "bytes",
        F.when(
            F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0,
            F.expr("substring(bytes, 1, 16)"),
        ).otherwise(F.col("bytes")),
    )
    r = gated_append(table, spark, batch, wap_id="b2", gate=_strict_gate)
    assert not r["passed"] and not r["published"]
    assert r["metrics"]["decode_failures"] > 0
    # readers never saw the bad batch; it stays staged for debugging
    assert table.scan(spark).count() == 100
    staged = table.staged_snapshots()
    assert [s.snapshot_id for s in staged] == [r["staged_snapshot_id"]]
    assert table.scan(spark, snapshot_id=r["staged_snapshot_id"]).count() == 140


def test_gated_append_metadata_failures_counted(table, spark):
    batch = generate_images(spark, 20, n_files=1, start=6000).withColumn(
        "fmt", F.lit("tiff")
    )
    r = gated_append(table, spark, batch, wap_id="b3", gate=_strict_gate)
    assert not r["passed"]
    assert r["metrics"]["bad_fmt"] == 20


def test_drop_on_fail_leaves_orphans_for_sweep(table, spark):
    batch = generate_images(spark, 20, n_files=1, start=7000).withColumn(
        "bytes", F.lit(b"")
    )
    r = gated_append(
        table, spark, batch, wap_id="b4", gate=_strict_gate, drop_on_fail=True
    )
    assert not r["passed"] and r.get("dropped")
    assert table.staged_snapshots() == []
    # the dropped files are unreachable → the orphan sweep reclaims them
    # (future cutoff = sweep everything unreferenced; single-writer test)
    import time

    swept = remove_orphan_files(table, older_than_ms=(time.time() + 60) * 1000)
    assert swept["deleted_files"] > 0
    assert table.scan(spark).count() == 100


def test_delta_scan_reads_only_the_new_files(table, spark):
    staged = table.commit(
        "append",
        table.write_files(generate_images(spark, 30, n_files=2, start=8000)),
        stage_only=True,
        wap_id="b5",
    )
    delta = table.delta_scan(spark, staged.snapshot_id)
    assert delta.count() == 30
    assert delta.filter(F.col("image_id") >= "img-000000008000").count() == 30
    with pytest.raises(ValueError, match="append"):
        man = table.manifest_pdf()
        rep = table.commit("replace", man)
        table.delta_scan(spark, rep.snapshot_id)
