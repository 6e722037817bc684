"""write.distribution-mode and sort.order table properties: declared
write distribution (Iceberg parity) and declared sort order honored by
ingest writes and bare cluster() calls."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import cluster
from aws_medallion_datalake_spark.operators.cluster import clustering_quality
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
)
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id", "ingest_date"]


def make(tmp_path, name, props=None):
    return Table.create(
        str(tmp_path / name), schema_ddl=SCHEMA,
        partition_cols=["ingest_date"], stats_cols=STATS,
        properties=props,
    )


def test_hash_distribution_partition_homogeneous(tmp_path, spark):
    t = make(tmp_path, "h", {"write.distribution-mode": "hash"})
    df = generate_images(spark, 400, n_files=16, n_dates=4)
    t.commit("append", t.write_files(df))
    man = t.manifest_pdf()
    # every file holds exactly one ingest_date (hash on the partition
    # tuple), and file count collapsed to the non-empty partitions
    assert (man["min_ingest_date"] == man["max_ingest_date"]).all()
    assert len(man) <= 8
    assert t.scan(spark).count() == 400


def test_range_distribution_preclusters(tmp_path, spark):
    base = make(tmp_path, "none")
    df = generate_images(spark, 600, n_files=16, n_dates=2)
    base.commit("append", base.write_files(df))
    rng = make(
        tmp_path, "r",
        {"write.distribution-mode": "range",
         "sort.order": "morton(phash, w, h)"},
    )
    rng.commit("append", rng.write_files(df))
    assert rng.scan(spark).count() == base.scan(spark).count() == 600
    # range-ordered ingest lands pre-clustered: strictly better file
    # min/max overlap on the curve's leading column than raw ingest
    assert clustering_quality(rng) < clustering_quality(base)


def test_bad_distribution_mode_raises(tmp_path, spark):
    t = make(tmp_path, "b", {"write.distribution-mode": "zigzag"})
    df = generate_images(spark, 20, n_files=2)
    with pytest.raises(ValueError, match="distribution-mode"):
        t.write_files(df)


def test_cluster_honors_sort_order_property(tmp_path, spark):
    t = make(tmp_path, "c", {"sort.order": "hilbert(phash, w, h)"})
    t.commit("append", t.write_files(generate_images(spark, 200, n_files=8)))
    snap = cluster(t, spark)
    assert snap.summary["curve"] == "hilbert"
    # explicit argument still wins
    snap = cluster(t, spark, curve="morton", mode="full")
    assert snap.summary["curve"] == "morton"


def test_cluster_bad_sort_order_property(tmp_path, spark):
    t = make(tmp_path, "bad", {"sort.order": "fractal(phash)"})
    t.commit("append", t.write_files(generate_images(spark, 20, n_files=2)))
    with pytest.raises(ValueError, match="sort.order"):
        cluster(t, spark)
