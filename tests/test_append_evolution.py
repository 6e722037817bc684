"""Table.append: by-name conformance, NULL fill, mergeSchema evolution;
VACUUM DRY RUN; SHOW CREATE TABLE round-trip."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table
from aws_medallion_datalake_spark.sqlcmd import EngineSQL

STATS = ["phash", "w", "h", "image_id", "ingest_date"]
N = 60


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=STATS,
        properties={"write.merge.mode": "copy-on-write"},
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=2)))
    return t


def test_append_conforms_by_name_and_fills_missing(table, spark):
    df = (
        generate_images(spark, 8, n_files=1, start=3000)
        .drop("caption")  # missing column -> NULL
        .select("phash", "image_id", "bytes", "w", "h", "fmt", "ingest_date")
    )  # shuffled column order -> matched by name
    snap = table.append(df)
    assert snap.operation == "append"
    assert snap.summary["rows_inserted"] == 8
    got = table.scan(spark).filter(F.col("caption").isNull())
    assert got.count() == 8


def test_append_rejects_unknown_columns_without_merge_schema(table, spark):
    df = generate_images(spark, 5, n_files=1, start=4000).withColumn(
        "license", F.lit("cc-by")
    )
    with pytest.raises(ValueError, match="merge_schema"):
        table.append(df)
    assert table.scan(spark).count() == N


def test_append_merge_schema_evolves_and_lands(table, spark):
    df = generate_images(spark, 5, n_files=1, start=4000).withColumn(
        "license", F.lit("cc-by")
    )
    snap = table.append(df, merge_schema=True)
    assert "license string" in table.metadata().schema_ddl
    assert snap.summary["rows_inserted"] == 5
    got = table.scan(spark)
    assert got.filter(F.col("license") == "cc-by").count() == 5
    # pre-evolution files read the new column as NULL
    assert got.filter(F.col("license").isNull()).count() == N


def test_vacuum_dry_run_deletes_nothing(table, spark):
    # create history: a second snapshot so expiry has something to chew
    table.commit(
        "append", table.write_files(generate_images(spark, 10, n_files=1, start=5000))
    )
    n_files_before = len(table.manifest_pdf())
    eng = EngineSQL(spark, {"images": table})
    res = eng.sql("VACUUM images RETAIN 0 HOURS DRY RUN").first()
    assert res["operation"] == "VACUUM DRY RUN"
    # nothing actually removed: all snapshots still present, files intact
    assert len(table.manifest_pdf()) == n_files_before
    assert table.scan(spark).count() == N + 10
    assert len(table.metadata().snapshots) == 2


def test_show_create_table_round_trips(table, spark, tmp_path):
    eng = EngineSQL(spark, {"images": table})
    stmt = eng.sql("SHOW CREATE TABLE images").first()["createtab_stmt"]
    assert "CREATE TABLE images" in stmt
    assert "PARTITIONED BY (ingest_date)" in stmt
    assert "'write.merge.mode' = 'copy-on-write'" in stmt
    # round-trip: the emitted DDL re-creates an equivalent empty table
    stmt2 = stmt.replace("CREATE TABLE images", "CREATE TABLE images2")
    stmt2 = stmt2.replace(
        f"LOCATION '{table.root}'", f"LOCATION '{tmp_path / 'tbl2'}'"
    )
    eng.sql(stmt2)
    t2 = eng.tables["images2"]
    from pyspark.sql.types import StructType

    assert StructType.fromDDL(t2.metadata().schema_ddl) == StructType.fromDDL(
        table.metadata().schema_ddl
    )
    assert t2.metadata().partition_cols == table.metadata().partition_cols
