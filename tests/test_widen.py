"""Type widening (Iceberg type promotion): metadata-only for data,
manifest-stats normalization, pruning stays sound, mixed-width files."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.compact import compact
from aws_medallion_datalake_spark.sources.generator import generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table

# w is int in the canonical schema; use a private narrow schema to widen
SCHEMA_N = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, ingest_date string"
)
STATS = ["phash", "w", "h", "image_id", "ingest_date"]
N = 120


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA_N, partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=4)))
    return t


def test_widen_int_to_bigint_reads_old_files(table, spark):
    before = table.scan(spark).agg(F.sum("w")).first()[0]
    table.widen_column("w", "bigint")
    assert "w bigint" in table.metadata().schema_ddl
    df = table.scan(spark)
    assert dict(df.dtypes)["w"] == "bigint"
    assert df.count() == N
    assert df.agg(F.sum("w")).first()[0] == before


def test_widen_rejects_narrowing_and_unknown(table, spark):
    with pytest.raises(ValueError, match="cannot widen"):
        table.widen_column("phash", "int")  # bigint -> int narrows
    with pytest.raises(ValueError, match="cannot widen"):
        table.widen_column("caption", "bigint")  # string -> int family
    with pytest.raises(KeyError):
        table.widen_column("nope", "bigint")


def test_widen_then_append_wide_values_and_prune(table, spark):
    table.widen_column("w", "bigint")
    wide = generate_images(spark, 10, n_files=1, start=70000).withColumn(
        "w", (F.col("w").cast("bigint") + F.lit(2**40)).cast("bigint")
    )
    # conform: the narrow generator emits int w; cast to the new schema
    table.commit("append", table.write_files(wide))
    assert table.scan(spark).count() == N + 10
    # values beyond int range round-trip
    big = table.scan(spark, predicates=[("w", ">=", 2**40)])
    assert big.count() == 10
    # manifest stats pruning still works across mixed-width manifests
    # (normalization commit rewrote old stats to int64)
    small = table.scan(spark, predicates=[("w", "<=", 2**31)])
    assert small.count() == N
    # the normalization commit is physical-only: changes() emits nothing
    # for it, and the post-widen append emits exactly its rows
    ops = [s.operation for s in table.metadata().snapshots]
    assert "replace" in ops


def test_widen_survives_compaction_roundtrip(table, spark):
    table.widen_column("w", "bigint")
    table.commit(
        "append",
        table.write_files(generate_images(spark, 30, n_files=3, start=50000)),
    )
    compact(table, spark, target_file_size_bytes=1 << 30)
    df = table.scan(spark)
    assert df.count() == N + 30
    assert dict(df.dtypes)["w"] == "bigint"


def test_widen_float_to_double(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "f"), "id bigint, score float", stats_cols=["id", "score"]
    )
    df = spark.range(50).select(
        F.col("id"), (F.col("id") / 7.0).cast("float").alias("score")
    )
    t.commit("append", t.write_files(df))
    t.widen_column("score", "double")
    got = t.scan(spark)
    assert dict(got.dtypes)["score"] == "double"
    assert got.count() == 50


def test_sql_alter_column_type(table, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    eng = EngineSQL(spark, {"images": table})
    eng.sql("ALTER TABLE images ALTER COLUMN w TYPE bigint")
    assert "w bigint" in table.metadata().schema_ddl
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == N
