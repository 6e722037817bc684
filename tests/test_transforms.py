"""Hidden partitioning (Iceberg-style partition transforms): spec
parsing, write-side derived stats, read-side predicate derivation and
file pruning, maintenance over transform-partitioned tables, and spec
evolution onto a transform."""

import json

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import cluster, compact
from aws_medallion_datalake_spark.sources import transforms as T
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table, prune_manifest

N = 400


def test_parse_and_validation():
    assert T.parse("fmt") == T.Transform("identity", "fmt")
    assert T.parse("bucket(16, image_id)").name == "image_id_bucket_16"
    assert T.parse("truncate(3, caption)").name == "caption_truncate_3"
    assert T.parse("days(ingest_date)").name == "ingest_date_days"
    with pytest.raises(ValueError):
        T.parse("bucket(image_id)")  # missing size
    with pytest.raises(ValueError):
        T.parse("days(3, ingest_date)")  # spurious size
    with pytest.raises(ValueError):
        T.parse("sha(4, x)")  # unknown kind


def test_derive_soundness():
    b = T.parse("bucket(8, image_id)")
    assert b.derive(">=", "a") is None  # bucket cannot prune ranges
    d = T.parse("days(ingest_date)")
    assert d.derive("between", ("2024-01-01", "2024-01-31")) == (
        "ingest_date_days",
        "between",
        (19723, 19753),
    )
    tr = T.parse("truncate(2, caption)")
    assert tr.derive("=", "abcdef") == ("caption_truncate_2", "=", "ab")


def test_derive_in_predicates():
    b = T.parse("bucket(8, image_id)")
    name, op, vals = b.derive("in", ["k1", "k2", "k1"])
    assert (name, op) == ("image_id_bucket_8", "in")
    assert vals == sorted({T._bucket_py("k1", 8), T._bucket_py("k2", 8)})
    d = T.parse("days(ingest_date)")
    assert d.derive("in", ["2024-01-01", "2024-01-02"]) == (
        "ingest_date_days", "in", [19723, 19724],
    )
    tr = T.parse("truncate(2, caption)")
    assert tr.derive("in", ["abc", "abd", "xyz"]) == (
        "caption_truncate_2", "in", ["ab", "xy"],
    )


@pytest.fixture()
def bucketed(tmp_path, spark):
    """Table hidden-partitioned by bucket(8, image_id) + days(ingest_date),
    with files routed so bucket stats are file-homogeneous."""
    t = Table.create(
        str(tmp_path / "tbl"),
        SCHEMA,
        partition_cols=["bucket(8, image_id)", "days(ingest_date)"],
        stats_cols=["phash"],
    )
    df = generate_images(spark, N, n_files=8)
    routed = df.repartitionByRange(8, *T.exprs(t.metadata().partition_cols))
    t.commit("append", t.write_files(routed))
    return t


def test_transform_stats_and_partition_json(bucketed):
    man = bucketed.manifest_pdf()
    assert "min_image_id_bucket_8" in man.columns
    assert "min_ingest_date_days" in man.columns
    # partition_json keys are the derived field names
    keys = set(json.loads(man["partition_json"].iloc[0]).keys())
    assert keys == {"image_id_bucket_8", "ingest_date_days"}
    # range routing makes most files bucket-homogeneous (boundaries may
    # split a bucket across two adjacent files — that only widens those
    # files' min/max, it never breaks pruning soundness)
    homog = (man["min_image_id_bucket_8"] == man["max_image_id_bucket_8"]).sum()
    assert homog >= len(man) // 2


def test_source_predicate_prunes_and_stays_correct(bucketed, spark):
    t = bucketed
    some_id = t.scan(spark).select("image_id").head()[0]
    # correctness: plain source-column predicate returns exactly the row
    got = t.scan(spark, predicates=[("image_id", "=", some_id)])
    assert got.count() == 1
    assert got.head()["image_id"] == some_id
    # pruning: the derived bucket predicate plans fewer files
    meta = t.metadata()
    statable = T.field_names(meta.partition_cols) + list(meta.stats_cols)
    man = t.manifest_pdf()
    pruned = prune_manifest(
        man,
        T.extend_predicates(meta.partition_cols, [("image_id", "=", some_id)]),
        statable,
    )
    assert 0 < len(pruned) < len(man)
    # date-range predicate on the days() transform also prunes
    lo = t.scan(spark).agg(F.min("ingest_date")).head()[0]
    sel = [("ingest_date", "between", (str(lo), str(lo)))]
    n_rows = t.scan(spark, predicates=sel).count()
    assert n_rows == t.scan(spark).filter(F.col("ingest_date") == lo).count()


def test_maintenance_over_transform_partitions(bucketed, spark):
    t = bucketed
    total = t.scan(spark).count()
    assert compact(t, spark, target_file_size_bytes=8 * 1024 * 1024) is not None
    assert t.scan(spark).count() == total
    assert cluster(t, spark, target_file_size_bytes=8 * 1024 * 1024) is not None
    assert t.scan(spark).count() == total
    checksum = t.scan(spark).agg(
        F.sum(F.length("bytes")), F.countDistinct("image_id")
    ).first()
    assert checksum[1] == total
    # post-cluster files still carry transform stats for pruning
    man = t.manifest_pdf()
    assert "min_image_id_bucket_8" in man.columns


def test_evolution_onto_transform_spec(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"),
        SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash"],
    )
    t.commit("append", t.write_files(generate_images(spark, 100, n_files=4)))
    t.set_partition_spec(["bucket(4, image_id)"])
    t.commit(
        "append",
        t.write_files(generate_images(spark, 100, n_files=4, start=5000)),
    )
    # old files: no bucket stats → kept (sound); new files prune on bucket
    assert t.scan(spark).count() == 200
    some_id = "img-%012d" % 5000  # a key written under the NEW spec
    got = t.scan(spark, predicates=[("image_id", "=", some_id)])
    assert got.count() == 1
    with pytest.raises(KeyError):
        t.set_partition_spec(["bucket(4, nope)"])
