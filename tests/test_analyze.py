"""ANALYZE TABLE column statistics: one-job computation, property
persistence, staleness, metadata relation, bloom NDV tuning."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import analyze_table
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.metatables import (
    column_stats_df,
    register_metadata_views,
)
from aws_medallion_datalake_spark.sources.tableformat import (
    BLOOM_COLS_PROP,
    BLOOM_NDV_PROP,
    Table,
)

N = 300


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"),
        SCHEMA,
        stats_cols=["phash", "w", "h", "image_id", "ingest_date"],
    )
    df = generate_images(spark, N, n_files=4).withColumn(
        "caption",
        F.when(F.col("w") % 5 == 0, F.lit(None).cast("string")).otherwise(
            F.col("caption")
        ),
    )
    t.commit("append", t.write_files(df))
    return t


def test_analyze_persists_accurate_stats(table, spark):
    stats = analyze_table(table, spark)
    cs = table.column_stats()
    assert cs is not None and not cs["stale"]
    assert cs["row_count"] == N
    assert cs["columns"] == stats
    # unique key: ndv within HLL tolerance of N, zero nulls
    assert abs(stats["image_id"]["ndv"] - N) <= max(3, int(0.1 * N))
    assert stats["image_id"]["null_count"] == 0
    # injected caption nulls are counted exactly
    n_null = table.scan(spark).filter(F.col("caption").isNull()).count()
    assert stats["caption"]["null_count"] == n_null
    # orderable min/max match the scan, stringified
    w_min, w_max = table.scan(spark).agg(F.min("w"), F.max("w")).first()
    assert stats["w"]["min"] == str(w_min) and stats["w"]["max"] == str(w_max)
    # binary payload gets avg_len but no min/max
    assert "avg_len" in stats["bytes"] and "min" not in stats["bytes"]
    assert stats["bytes"]["avg_len"] > 0


def test_analyze_staleness_and_refresh(table, spark):
    analyze_table(table, spark, ["image_id", "w"])
    assert table.column_stats()["stale"] is False
    table.commit(
        "append", table.write_files(generate_images(spark, 50, n_files=1, start=9000))
    )
    assert table.column_stats()["stale"] is True
    stats = analyze_table(table, spark, ["image_id"])
    cs = table.column_stats()
    assert cs["stale"] is False and cs["row_count"] == N + 50
    assert abs(stats["image_id"]["ndv"] - (N + 50)) <= max(3, int(0.1 * (N + 50)))


def test_analyze_errors(table, spark, tmp_path):
    with pytest.raises(ValueError, match="unknown columns"):
        analyze_table(table, spark, ["nope"])
    empty = Table.create(str(tmp_path / "e"), SCHEMA)
    with pytest.raises(ValueError, match="empty table"):
        analyze_table(empty, spark)


def test_column_stats_metadata_relation(table, spark):
    # empty relation before analyze, populated + SQL-visible after
    assert column_stats_df(table, spark).count() == 0
    analyze_table(table, spark)
    register_metadata_views(table, spark, "t")
    got = spark.sql(
        "SELECT column, ndv, null_count FROM t_column_stats "
        "WHERE column = 'image_id'"
    ).first()
    assert abs(got["ndv"] - N) <= max(3, int(0.1 * N))
    assert got["null_count"] == 0
    n_cols = spark.sql("SELECT count(*) FROM t_column_stats").first()[0]
    assert n_cols == len(table._schema(spark).fields)


def test_analyze_tunes_bloom_ndv(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "b"),
        SCHEMA,
        stats_cols=["phash", "image_id"],
        properties={BLOOM_COLS_PROP: "image_id"},
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=4)))
    assert t.metadata().properties.get(BLOOM_NDV_PROP) is None
    analyze_table(t, spark, ["image_id"], tune_bloom=True)
    ndv = int(t.metadata().properties[BLOOM_NDV_PROP])
    # per-row-group expectation: max(1024, min(table ndv, avg rows/file));
    # at 300 rows / 4 files the 1024 floor dominates
    assert ndv == 1024
