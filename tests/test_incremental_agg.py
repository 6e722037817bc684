"""Incremental materialized aggregate: changelog-fed refreshes must
equal a full recompute after any mix of append/merge/delete."""

from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import compact, delete_where
from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.pipeline.incremental import (
    create_agg_table,
    refresh_agg,
)
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table

GROUPS = ["fmt", "ingest_date"]
MEASURES = {"n_images": ("image_id", "count"), "total_w": ("w", "sum")}


def _full(src_df):
    return src_df.groupBy(*GROUPS).agg(
        F.count("*").cast("bigint").alias("n_images"),
        F.sum("w").cast("double").alias("total_w"),
    )


def _assert_matches(gold, src, spark):
    got = gold.scan(spark).select(*GROUPS, "n_images", "total_w").filter(
        F.col("n_images") != 0
    )
    want = _full(src.scan(spark))
    assert (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    ), (sorted(got.collect()), sorted(want.collect()))


def test_incremental_agg_tracks_full_recompute(tmp_path, spark):
    src = Table.create(
        str(tmp_path / "src"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=["phash"],
    )
    src.commit("append", src.write_files(generate_images(spark, 150, n_files=4)))
    gold = create_agg_table(str(tmp_path / "gold"), src, spark, GROUPS, MEASURES)
    ckpt = str(tmp_path / "agg.jsonl")

    # initial refresh = snapshot-as-inserts
    r1 = refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)
    assert r1 is not None and r1["result"] > 0
    _assert_matches(gold, src, spark)
    assert refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES) is None

    # append + group-moving merge (fmt/w change) + CoW delete
    src.commit("append", src.write_files(generate_images(spark, 40, n_files=1, start=600)))
    upd = generate_images(spark, 30, n_files=1, start=130).withColumn(
        "w", F.col("w") + F.lit(5)
    )
    merge_into(src, spark, upd, key="image_id")
    victim = src.scan(spark).select("image_id").head()[0]
    delete_where(src, spark, [("image_id", "=", victim)])

    r2 = refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)
    assert r2 is not None
    _assert_matches(gold, src, spark)

    # physical-only source commit: refresh is a no-op batch
    compact(src, spark, target_file_size_bytes=32 * 1024 * 1024)
    r3 = refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)
    assert r3 is not None and r3["result"] == 0
    _assert_matches(gold, src, spark)


def test_refresh_replay_after_lost_bookmark_is_exactly_once(tmp_path, spark):
    """Crash between the gold MERGE commit and the bookmark write: the
    replayed range must NOT double-apply the deltas."""
    src = Table.create(
        str(tmp_path / "src"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=["phash"],
    )
    src.commit("append", src.write_files(generate_images(spark, 80, n_files=2)))
    gold = create_agg_table(str(tmp_path / "gold"), src, spark, GROUPS, MEASURES)
    ckpt = str(tmp_path / "agg.jsonl")
    refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)

    src.commit("append", src.write_files(generate_images(spark, 20, n_files=1, start=300)))
    refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)
    _assert_matches(gold, src, spark)

    # simulate the crash: drop the last bookmark line, keep the gold commit
    lines = open(ckpt).read().splitlines(keepends=True)
    with open(ckpt, "w") as f:
        f.writelines(lines[:-1])
    r = refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES)  # replays range
    assert r is not None and r["result"] == 0  # skipped, not re-applied
    _assert_matches(gold, src, spark)
    assert refresh_agg(gold, src, spark, ckpt, GROUPS, MEASURES) is None
