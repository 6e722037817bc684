"""Footer-statistics manifest collector == data-scan collector, exactly.

The footer path (zero data IO) must be indistinguishable from the scan
path (one Spark agg over every byte) — same columns, dtypes, values —
because manifests from both interleave in one table over its lifetime
(mergeSchema read) and the pruners binary-trust the bounds.
"""

import pandas as pd
import pytest

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import (
    Table,
    _footer_file_stats,
)

STATS = ["phash", "w", "h", "image_id", "fmt"]


def _both(t, spark, prefix):
    fast = t.collect_stats_for_prefix(spark, prefix, method="footer")
    slow = t.collect_stats_for_prefix(spark, prefix, method="scan")
    fast = fast.sort_values("path").reset_index(drop=True)[sorted(fast.columns)]
    slow = slow.sort_values("path").reset_index(drop=True)[sorted(slow.columns)]
    return fast, slow


def test_footer_equals_scan_identity_partition(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    df = generate_images(spark, 300, n_files=7, n_dates=3)
    prefix = t.new_data_prefix()
    t.data_writer(df).parquet(prefix)
    fast, slow = _both(t, spark, prefix)
    pd.testing.assert_frame_equal(fast, slow)


def test_footer_equals_scan_with_transforms_and_nulls(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"),
        schema_ddl=SCHEMA,
        partition_cols=["months(ingest_date)", "truncate(2, fmt)"],
        stats_cols=["phash", "w", "caption"],
    )
    df = generate_images(spark, 200, n_files=5, n_dates=4)
    # null out a stats column in part of the data (all-null chunks must
    # fold to NULL bounds + exact null counts on both paths)
    from pyspark.sql import functions as F

    df = df.withColumn(
        "caption", F.when(F.col("w") % 3 == 0, F.col("caption"))
    )
    prefix = t.new_data_prefix()
    t.data_writer(df).parquet(prefix)
    fast, slow = _both(t, spark, prefix)
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["nulls_caption"].sum() > 0


def test_bucket_transform_uses_scan_collector(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"),
        schema_ddl=SCHEMA,
        partition_cols=["bucket(8, image_id)"],
        stats_cols=["phash"],
    )
    df = generate_images(spark, 60, n_files=2, n_dates=1)
    prefix = t.new_data_prefix()
    t.data_writer(df).parquet(prefix)
    # auto must still work (falls to scan); forcing footer is an error
    pdf = t.collect_stats_for_prefix(spark, prefix)
    assert len(pdf) >= 1 and "min_image_id_bucket_8" in pdf.columns


def test_footer_file_stats_bails_on_long_strings(tmp_path, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "long.parquet")
    pq.write_table(
        pa.table({"s": ["x" * 100, "y" * 100], "n": [1, 2]}), p
    )
    assert _footer_file_stats(p, ["s"]) is None  # truncation risk
    got = _footer_file_stats(p, ["n"])
    assert got is not None and got["cols"]["n"] == (1, 2, 0)


def test_write_files_defaults_to_footer_and_prunes(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "t"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "w"],
    )
    t.commit("append", t.write_files(generate_images(spark, 200, n_files=6, n_dates=2)))
    man = t.manifest_pdf()
    assert man["record_count"].sum() == 200
    # pruning on footer-harvested stats stays sound vs a real filter
    lo = int(man["min_phash"].min())
    got = t.scan(spark, predicates=[("phash", "<=", lo)]).count()
    want = t.scan(spark).filter(f"phash <= {lo}").count()
    assert got == want
