"""Column rename/drop: metadata-only schema evolution over plain parquet.

Iceberg resolves columns by field id, making RENAME/DROP pure metadata
ops (reference intent: terraform/glue_digit.tf:54-55 configures Iceberg);
plain parquet resolves by name, so the engine keeps a name-mapping
(Iceberg's ``schema.name-mapping.default`` analogue) and every data-file
read goes through ``Table.read_data``, which coalesces name generations.
"""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.compact import compact
from aws_medallion_datalake_spark.operators.delete import delete_where
from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
    generate_updates,
)
from aws_medallion_datalake_spark.sources.tableformat import (
    RENAMES_PROP,
    RETIRED_PROP,
    Table,
)

STATS = ["phash", "w", "h", "image_id"]


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    t.commit("append", t.write_files(generate_images(spark, 120, n_files=4)))
    return t


def _renamed_updates(spark, n, n_new, n_upd):
    """Merge source with the post-rename column name."""
    return generate_updates(spark, n, n_new, n_upd, n_files=2).withColumnRenamed(
        "caption", "caption_text"
    )


def test_rename_scan_mixed_generations(table, spark):
    before = {
        r["image_id"]: r["caption"]
        for r in table.scan(spark).select("image_id", "caption").collect()
    }
    table.rename_column("caption", "caption_text")
    # new-generation files carry the new physical name
    df2 = generate_images(spark, 60, n_files=2, start=10_000).withColumnRenamed(
        "caption", "caption_text"
    )
    table.commit("append", table.write_files(df2))
    got = table.scan(spark).select("image_id", "caption_text").collect()
    assert len(got) == 180
    assert "caption" not in table.scan(spark).columns
    # old-generation rows surface their values under the NEW name
    for r in got:
        if r["image_id"] in before:
            assert r["caption_text"] == before[r["image_id"]]
        else:
            assert r["caption_text"] is not None


def test_rename_stats_col_prunes_and_filters(table, spark):
    """Renaming a stats column: row-level predicates stay correct; old
    files lose pruning (missing stats -> keep, sound) until rewritten."""
    table.rename_column("phash", "fingerprint")
    assert "fingerprint" in table.metadata().stats_cols
    lo = 1 << 62
    expected = table.scan(spark).filter(F.col("fingerprint") >= lo).count()
    got = table.scan(spark, predicates=[("fingerprint", ">=", lo)]).count()
    assert got == expected > 0
    # after compaction the new physical name carries stats again
    compact(table, spark, target_file_size_bytes=1 << 22)
    man = table.manifest_pdf()
    assert "min_fingerprint" in man.columns
    assert man["min_fingerprint"].notna().all()
    assert table.scan(spark, predicates=[("fingerprint", ">=", lo)]).count() == (
        expected
    )


def test_rewrite_migrates_physical_names(table, spark):
    table.rename_column("caption", "caption_text")
    compact(table, spark, target_file_size_bytes=1 << 22)
    man = table.manifest_pdf()
    phys = pq.read_schema(os.path.join(table.root, man["path"].iloc[0]))
    assert "caption_text" in phys.names and "caption" not in phys.names
    # once every live file is rewritten, a fresh scan still works
    assert table.scan(spark).select("caption_text").count() == 120


def test_merge_over_mixed_generations(table, spark):
    table.rename_column("caption", "caption_text")
    src = _renamed_updates(spark, 120, 20, 10)  # 20 updates + 10 inserts
    merge_into(table, spark, src, key="image_id", target_file_size_bytes=1 << 22)
    out = table.scan(spark)
    assert out.count() == 130
    # updated rows carry the source caption (rev2 suffix) under the new name
    assert (
        out.filter(F.col("caption_text").endswith("(rev2)")).count() == 20
    )
    assert out.filter(F.col("caption_text").isNull()).count() == 0


def test_rename_chain(table, spark):
    table.rename_column("caption", "caption_mid")
    table.commit(
        "append",
        table.write_files(
            generate_images(spark, 30, n_files=1, start=20_000)
            .withColumnRenamed("caption", "caption_mid")
        ),
    )
    table.rename_column("caption_mid", "caption_text")
    ren = json.loads(table.metadata().properties[RENAMES_PROP])
    assert ren["caption_text"] == ["caption_mid", "caption"]
    df = table.scan(spark)
    assert df.count() == 150
    assert df.filter(F.col("caption_text").isNull()).count() == 0


def test_drop_column(table, spark):
    table.drop_column("caption")
    assert "caption" not in table.scan(spark).columns
    assert table.scan(spark).count() == 120
    retired = json.loads(table.metadata().properties[RETIRED_PROP])
    assert "caption" in retired
    with pytest.raises(ValueError, match="retired"):
        table.add_columns("caption string")
    table.add_columns("caption2 string")  # fresh names still fine
    # rewrites physically shed the dropped column
    compact(table, spark, target_file_size_bytes=1 << 22)
    man = table.manifest_pdf()
    phys = pq.read_schema(os.path.join(table.root, man["path"].iloc[0]))
    assert "caption" not in phys.names


def test_drop_then_rename_interplay(table, spark):
    table.rename_column("caption", "caption_text")
    table.drop_column("caption_text")
    retired = set(json.loads(table.metadata().properties[RETIRED_PROP]))
    # BOTH generations retire: old files carry `caption` physically
    assert {"caption", "caption_text"} <= retired
    with pytest.raises(ValueError, match="retired"):
        table.rename_column("fmt", "caption")


def test_guards(table, spark):
    with pytest.raises(ValueError, match="partition source"):
        table.rename_column("ingest_date", "dt")
    with pytest.raises(ValueError, match="partition source"):
        table.drop_column("ingest_date")
    with pytest.raises(KeyError):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("caption", "fmt")
    delete_where(
        table, spark, [("w", "=", 32)], mode="merge-on-read",
        target_file_size_bytes=1 << 22,
    )
    with pytest.raises(ValueError, match="pending"):
        table.rename_column("caption", "caption_text")
    with pytest.raises(ValueError, match="pending"):
        table.drop_column("caption")


def test_cdc_and_delta_scan_through_rename(table, spark):
    table.rename_column("caption", "caption_text")
    sid0 = table.metadata().current_snapshot_id
    table.commit(
        "append",
        table.write_files(
            generate_images(spark, 40, n_files=1, start=30_000)
            .withColumnRenamed("caption", "caption_text")
        ),
    )
    delta = table.changes(spark, from_snapshot_id=sid0)
    assert delta.count() == 40
    assert "caption_text" in delta.columns
    cdc = table.changes_cdc(spark, from_snapshot_id=sid0)
    assert cdc.filter(F.col("_change_type") == "insert").count() == 40
