"""Medallion stages + the scan-equality correctness gate (BASELINE.json)."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import cluster, compact, expire_snapshots
from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.pipeline.medallion import (
    bronze_ingest,
    gold_build,
    quality_profile,
    silver_refine,
    silver_transform,
)
from aws_medallion_datalake_spark.pipeline.verify import scan_equality_report
from aws_medallion_datalake_spark.sources.generator import generate_updates

N = 500
TARGET = 1024 * 1024


@pytest.fixture(scope="module")
def layers(tmp_path_factory, spark):
    base = tmp_path_factory.mktemp("medallion")
    bronze = bronze_ingest(spark, str(base / "bronze"), N, n_files=20, n_dates=2)
    silver = silver_refine(bronze, spark, str(base / "silver"))
    gold = gold_build(silver, spark, str(base / "gold"))
    return bronze, silver, gold


def test_silver_semantics(layers, spark):
    bronze, silver, _ = layers
    sdf = silver.scan(spark)
    assert sdf.count() == N  # generator emits unique ids; nothing dropped
    assert sdf.filter(F.col("image_id").isNull()).count() == 0
    assert sdf.select("batch_id").distinct().count() == 1
    # dirty rows are cleaned/filtered by the same plan
    dirty = bronze.scan(spark).limit(5).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("\ttail\n"))
    )
    cleaned = silver_transform(dirty)
    caps = [r["caption"] for r in cleaned.select("caption").collect()]
    assert all("\t" not in c and "\n" not in c for c in caps)
    nulled = dirty.withColumn("image_id", F.lit(None).cast("string"))
    assert silver_transform(nulled).count() == 0


def test_gold_fact_matches_silver(layers, spark):
    _, silver, gold = layers
    fact = gold.scan(spark)
    total = fact.agg(F.sum("n_images")).first()[0]
    assert total == N
    # spot-check one group against a direct aggregation
    row = fact.orderBy("ingest_date", "fmt").first()
    direct = (
        silver.scan(spark)
        .filter(
            (F.col("ingest_date") == row["ingest_date"])
            & (F.col("fmt") == row["fmt"])
        )
        .agg(F.count("*"), F.sum(F.length("bytes")))
        .first()
    )
    assert direct[0] == row["n_images"]
    assert direct[1] == row["total_bytes"]


def test_quality_profile_one_pass(layers, spark):
    _, silver, _ = layers
    prof = quality_profile(silver.scan(spark).withColumn(
        "maybe_null", F.when(F.col("w") > 64, F.col("caption"))
    ))
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["image_id"]["completeness_pct"] == 100.0
    assert rows["image_id"]["status"] == "GOOD"
    assert rows["maybe_null"]["completeness_pct"] < 100.0


def test_scan_equality_gate_after_maintenance(layers, spark):
    """THE correctness gate: maintenance must not change scan content."""
    _, silver, _ = layers
    pre = silver.scan(spark, snapshot_id=1).cache()
    pre.count()
    compact(silver, spark, target_file_size_bytes=TARGET)
    cluster(silver, spark, curve="hilbert", target_file_size_bytes=TARGET)
    report = scan_equality_report(pre, silver.scan(spark))
    assert report["pass"], report
    # compaction/clustering are byte-preserving: every row byte-exact
    assert report["byte_exact_rows"] == report["rows"] == N


def test_scan_equality_gate_after_merge(layers, spark):
    """Merge must land EXACTLY the source payloads (PSNR gate on lossy)."""
    _, silver, _ = layers
    src = generate_updates(spark, N, n_updates=80, n_inserts=50).withColumn(
        "batch_id", F.lit("batch-1")
    )
    merge_into(silver, spark, src)
    post = silver.scan(spark)
    assert post.count() == N + 50
    # rows not touched by the merge are byte-identical to pre-merge
    pre = silver.scan(spark, snapshot_id=1)
    untouched_pre = pre.join(src.select("image_id"), "image_id", "left_anti")
    untouched_post = post.join(src.select("image_id"), "image_id", "left_anti")
    rep = scan_equality_report(untouched_pre, untouched_post)
    assert rep["pass"] and rep["byte_exact_rows"] == rep["rows"]
    # merged rows equal the source exactly
    merged_rows = post.join(src.select("image_id"), "image_id", "left_semi")
    rep2 = scan_equality_report(src, merged_rows)
    assert rep2["pass"], rep2


def test_scan_equality_detects_corruption(layers, spark):
    _, silver, _ = layers
    good = silver.scan(spark).limit(20).cache()
    # corrupt a row guaranteed to be in the sample: the minimum image_id
    victim = good.agg(F.min("image_id")).first()[0]
    bad_caption = good.withColumn(
        "caption",
        F.when(
            F.col("image_id") == victim, F.concat(F.col("caption"), F.lit("!"))
        ).otherwise(F.col("caption")),
    )
    rep = scan_equality_report(good, bad_caption)
    assert not rep["pass"] and rep["caption_mismatches"] > 0
    missing = good.filter(F.col("image_id") != victim)
    rep2 = scan_equality_report(good, missing)
    assert not rep2["pass"] and rep2["missing_rows"] > 0


def test_expire_after_pipeline(layers, spark):
    _, silver, _ = layers
    rows = silver.scan(spark).count()
    metrics = expire_snapshots(silver, keep_last=1)
    assert metrics["deleted_files"] > 0
    assert silver.scan(spark).count() == rows
