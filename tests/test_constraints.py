"""CHECK constraints: add-time validation of existing data, row-level
enforcement inside every data-write job, SQL surface, tri-state NULL."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id", "ingest_date"]
N = 80


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"), SCHEMA, partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=4)))
    return t


def test_add_constraint_validates_existing_data(table, spark):
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint(spark, "impossible", "w > 100000")
    table.add_constraint(spark, "pos_dims", "w > 0 AND h > 0")
    assert table.constraints() == {"pos_dims": "w > 0 AND h > 0"}


def test_write_enforces_constraint(table, spark):
    table.add_constraint(spark, "pos_dims", "w > 0")
    bad = generate_images(spark, 10, n_files=1, start=5000).withColumn(
        "w", F.lit(-1)
    )
    with pytest.raises(Exception, match="pos_dims"):
        table.write_files(bad)
    # table state unchanged (the failed write never committed)
    assert table.scan(spark).count() == N
    good = generate_images(spark, 10, n_files=1, start=5000)
    table.commit("append", table.write_files(good))
    assert table.scan(spark).count() == N + 10


def test_merge_insert_enforces_constraint(table, spark):
    table.add_constraint(spark, "cap_present", "caption IS NOT NULL")
    src = generate_images(spark, 6, n_files=1, start=7000).withColumn(
        "caption", F.lit(None).cast("string")
    )
    with pytest.raises(Exception, match="cap_present"):
        merge_into(table, spark, src)


def test_null_condition_passes(table, spark):
    """SQL CHECK tri-state: NULL conditions do not violate."""
    table.add_constraint(spark, "null_ok", "w > 0")
    df = generate_images(spark, 4, n_files=1, start=8000).withColumn(
        "w", F.lit(None).cast("int")
    )
    table.commit("append", table.write_files(df))
    assert table.scan(spark).count() == N + 4


def test_drop_constraint_and_managed_property(table, spark):
    table.add_constraint(spark, "pos_dims", "w > 0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint(spark, "pos_dims", "w > 1")
    with pytest.raises(ValueError, match="managed"):
        table.set_properties({"constraint.sneaky": "1 = 1"})
    table.drop_constraint("pos_dims")
    assert table.constraints() == {}
    with pytest.raises(KeyError):
        table.drop_constraint("pos_dims")
    bad = generate_images(spark, 3, n_files=1, start=9000).withColumn(
        "w", F.lit(-1)
    )
    table.commit("append", table.write_files(bad))  # no longer enforced


def test_constraint_on_empty_table_resolves_schema(tmp_path, spark):
    t = Table.create(str(tmp_path / "e"), SCHEMA, stats_cols=STATS)
    with pytest.raises(Exception):
        t.add_constraint(spark, "typo", "no_such_col > 0")
    t.add_constraint(spark, "pos", "w > 0")
    assert t.constraints() == {"pos": "w > 0"}


def test_sql_add_and_drop_constraint(table, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    eng = EngineSQL(spark, {"images": table})
    eng.sql("ALTER TABLE images ADD CONSTRAINT big CHECK (w > 0 AND h > 0)")
    assert "big" in table.constraints()
    eng.sql("ALTER TABLE images DROP CONSTRAINT big")
    assert table.constraints() == {}
