"""CDC changelog reads (Table.changes_cdc): row-level insert/delete
feed across append, copy-on-write merge/delete, merge-on-read
positional + equality deletes, and physical-only rewrites."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import (
    apply_deletes,
    compact,
    delete_where,
    equality_delete,
    merge_into,
)
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"),
        SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash"],
    )
    t.commit("append", t.write_files(generate_images(spark, 120, n_files=4)))
    return t


def _by_type(df):
    rows = df.groupBy("_change_type").count().collect()
    return {r["_change_type"]: r["count"] for r in rows}


def test_append_emits_inserts_only(table, spark):
    sid0 = table.metadata().current_snapshot_id
    table.commit("append", table.write_files(generate_images(spark, 30, n_files=1, start=500)))
    cdc = table.changes_cdc(spark, sid0)
    assert _by_type(cdc) == {"insert": 30}
    assert cdc.filter(F.col("_change_type") == "insert").agg(
        F.min("image_id")
    ).first()[0] == "img-%012d" % 500


def test_merge_update_emits_delete_plus_insert(table, spark):
    sid0 = table.metadata().current_snapshot_id
    src = generate_images(spark, 40, n_files=1, start=100).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )  # ids 100-139: 20 matched, 20 new
    merge_into(table, spark, src, key="image_id")
    cdc = table.changes_cdc(spark, sid0)
    assert _by_type(cdc) == {"insert": 40, "delete": 20}
    # the matched keys appear as delete(old caption) + insert(new caption)
    pre = cdc.filter(
        (F.col("_change_type") == "delete") & ~F.col("caption").endswith("-v2")
    )
    assert pre.count() == 20
    post = cdc.filter(
        (F.col("_change_type") == "insert") & F.col("caption").endswith("-v2")
    )
    assert post.count() == 40


def test_merge_update_pairing_with_key_cols(table, spark):
    """key_cols (compute-updates mode): same-commit delete+insert pairs
    sharing the key become update_preimage/update_postimage."""
    sid0 = table.metadata().current_snapshot_id
    src = generate_images(spark, 40, n_files=1, start=100).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )
    merge_into(table, spark, src, key="image_id")
    cdc = table.changes_cdc(spark, sid0, key_cols=["image_id"])
    assert _by_type(cdc) == {
        "insert": 20,
        "update_postimage": 20,
        "update_preimage": 20,
    }
    pre = cdc.filter(F.col("_change_type") == "update_preimage")
    post = cdc.filter(F.col("_change_type") == "update_postimage")
    assert {r["image_id"] for r in pre.collect()} == {
        r["image_id"] for r in post.collect()
    }
    assert post.filter(~F.col("caption").endswith("-v2")).count() == 0


def test_cow_delete_emits_deletes(table, spark):
    sid0 = table.metadata().current_snapshot_id
    victim = table.scan(spark).select("image_id").head()[0]
    delete_where(table, spark, [("image_id", "=", victim)])
    cdc = table.changes_cdc(spark, sid0)
    assert _by_type(cdc) == {"delete": 1}
    assert cdc.head()["image_id"] == victim


def test_mor_positional_delete_then_apply(table, spark):
    sid0 = table.metadata().current_snapshot_id
    victim = table.scan(spark).select("image_id").head()[0]
    delete_where(table, spark, [("image_id", "=", victim)], mode="merge-on-read")
    sid1 = table.metadata().current_snapshot_id
    cdc = table.changes_cdc(spark, sid0)
    assert _by_type(cdc) == {"delete": 1}
    assert cdc.head()["image_id"] == victim
    # materializing the delete is physical-only: no further changes
    apply_deletes(table, spark)
    assert table.changes_cdc(spark, sid1).count() == 0


def test_equality_delete_and_reinsert(table, spark):
    sid0 = table.metadata().current_snapshot_id
    ids = [r["image_id"] for r in table.scan(spark).select("image_id").head(3)]
    equality_delete(table, spark, ids, cols=["image_id"])
    cdc = table.changes_cdc(spark, sid0)
    assert _by_type(cdc) == {"delete": 3}
    assert {r["image_id"] for r in cdc.collect()} == set(ids)
    # a later re-insert of a deleted key is an insert (sequence rule)
    sid1 = table.metadata().current_snapshot_id
    n0 = int(ids[0].split("-")[1])
    table.commit(
        "append", table.write_files(generate_images(spark, 1, n_files=1, start=n0))
    )
    cdc2 = table.changes_cdc(spark, sid1)
    assert _by_type(cdc2) == {"insert": 1}
    assert cdc2.head()["image_id"] == ids[0]


def test_physical_rewrites_emit_nothing(table, spark):
    sid0 = table.metadata().current_snapshot_id
    assert compact(table, spark, target_file_size_bytes=8 * 1024 * 1024) is not None
    assert table.changes_cdc(spark, sid0).count() == 0


def test_cdc_spark_planner_path(table, spark, monkeypatch):
    """Above SPARK_MANIFEST_THRESHOLD the per-link file diff runs as
    Spark anti-joins; results must match the pandas planner."""
    import aws_medallion_datalake_spark.sources.tableformat as tf

    sid0 = table.metadata().current_snapshot_id
    table.commit("append", table.write_files(generate_images(spark, 10, n_files=1, start=800)))
    victim = table.scan(spark).select("image_id").head()[0]
    delete_where(table, spark, [("image_id", "=", victim)])
    want = _by_type(table.changes_cdc(spark, sid0))
    monkeypatch.setattr(tf, "SPARK_MANIFEST_THRESHOLD", 0)
    assert _by_type(table.changes_cdc(spark, sid0)) == want == {
        "insert": 10,
        "delete": 1,
    }


def test_changelog_replay_reconstructs_state(table, spark):
    """Multiset invariant over a mixed history: rows(from) + inserts −
    deletes == rows(to)."""
    sid0 = table.metadata().current_snapshot_id
    table.commit("append", table.write_files(generate_images(spark, 25, n_files=1, start=700)))
    src = generate_images(spark, 30, n_files=1, start=110).withColumn(
        "w", F.col("w") + F.lit(1)
    )
    merge_into(table, spark, src, key="image_id")
    victim = table.scan(spark).select("image_id").head()[0]
    delete_where(table, spark, [("image_id", "=", victim)])
    compact(table, spark, target_file_size_bytes=8 * 1024 * 1024)

    cdc = table.changes_cdc(spark, sid0)
    cols = [f.name for f in table.scan(spark).schema.fields]
    sig = lambda df: df.select(F.xxhash64(*[F.col(c) for c in cols]).alias("s"))
    base = sig(table.scan(spark, snapshot_id=sid0)).groupBy("s").count()
    ins = (
        sig(cdc.filter(F.col("_change_type") == "insert")).groupBy("s").count()
        .withColumnRenamed("count", "i")
    )
    dels = (
        sig(cdc.filter(F.col("_change_type") == "delete")).groupBy("s").count()
        .withColumnRenamed("count", "d")
    )
    final = (
        base.join(ins, "s", "full_outer").join(dels, "s", "full_outer")
        .select(
            "s",
            (
                F.coalesce("count", F.lit(0))
                + F.coalesce("i", F.lit(0))
                - F.coalesce("d", F.lit(0))
            ).alias("n"),
        )
        .filter(F.col("n") != 0)
    )
    expect = sig(table.scan(spark)).groupBy("s").count()
    assert (
        final.join(expect, "s", "full_outer")
        .filter(
            F.coalesce("n", F.lit(0)) != F.coalesce("count", F.lit(0))
        )
        .count()
        == 0
    )
