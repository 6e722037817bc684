"""Column default values (Iceberg v3 default-values analogue): unset
values — files predating the column, NULLs written later — read as the
default; stats pruning on a defaulted column is disabled (sound)."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import (
    compact,
    fast_count,
    fast_min_max,
)
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
)
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id"]


def make_table(tmp_path, spark, n=120, n_files=6) -> Table:
    t = Table.create(
        str(tmp_path / "images"), schema_ddl=SCHEMA,
        partition_cols=["ingest_date"], stats_cols=STATS,
    )
    t.commit("append", t.write_files(generate_images(spark, n, n_files=n_files)))
    return t


def test_default_fills_old_files(tmp_path, spark):
    t = make_table(tmp_path, spark)
    t.add_columns("quality_score double, reviewed boolean",
                  defaults={"quality_score": 0.5})
    df = t.scan(spark)
    assert df.filter(F.col("quality_score") == 0.5).count() == 120
    # no default on reviewed: plain NULL evolution semantics
    assert df.filter(F.col("reviewed").isNull()).count() == 120

    # new rows with explicit values keep them; NULLs read as the default
    new = (
        generate_images(spark, 30, n_files=2, start=1000)
        .withColumn(
            "quality_score",
            F.when(F.col("w") % 2 == 0, F.lit(0.9)).otherwise(F.lit(None)),
        )
        .withColumn("reviewed", F.lit(True))
    )
    t.commit("append", t.write_files(new))
    df = t.scan(spark)
    n_explicit = df.filter(F.col("quality_score") == 0.9).count()
    assert n_explicit == new.filter("w % 2 = 0").count()
    assert df.filter(F.col("quality_score") == 0.5).count() == 150 - n_explicit
    assert df.filter(F.col("quality_score").isNull()).count() == 0


def test_default_survives_compaction(tmp_path, spark):
    t = make_table(tmp_path, spark)
    t.add_columns("score bigint", defaults={"score": 7})
    t.commit("append", t.write_files(
        generate_images(spark, 40, n_files=4, start=500)
    ))
    compact(t, spark)
    df = t.scan(spark)
    assert df.filter(F.col("score") == 7).count() == 160
    assert df.count() == 160


def test_scan_predicates_on_defaulted_column_are_sound(tmp_path, spark):
    """A defaulted stats column must not prune files by stale stats:
    scan(predicates=...) equals a real filter."""
    t = make_table(tmp_path, spark)
    t.add_columns("score bigint", defaults={"score": 7})
    # make score a stats column going forward, write rows with real values
    meta = t.metadata()
    t2 = Table.load(t.root)
    new = generate_images(spark, 40, n_files=4, start=500).withColumn(
        "score", F.lit(1)
    )
    t.commit("append", t.write_files(new))
    got = t.scan(spark, predicates=[("score", "=", 7)]).count()
    want = t.scan(spark).filter("score = 7").count()
    assert got == want == 120
    assert meta is not None and t2 is not None


def test_fast_count_with_default(tmp_path, spark):
    t = make_table(tmp_path, spark)
    t.add_columns("score bigint", defaults={"score": 7})
    assert fast_count(t, spark, [("score", "=", 7)]) == 120
    assert fast_count(t, spark, [("score", "notnull", None)]) == 120
    assert fast_count(t, spark, [("score", "isnull", None)]) == 0
    with pytest.raises(ValueError):
        fast_min_max(t, "score")


def test_rename_and_drop_defaulted_column(tmp_path, spark):
    t = make_table(tmp_path, spark)
    t.add_columns("score bigint", defaults={"score": 7})
    t.rename_column("score", "rank")
    assert t.scan(spark).filter(F.col("rank") == 7).count() == 120
    t.drop_column("rank")
    assert "rank" not in t.scan(spark).columns


def test_defaults_validation(tmp_path, spark):
    t = make_table(tmp_path, spark)
    with pytest.raises(ValueError, match="not being added"):
        t.add_columns("score bigint", defaults={"other": 1})


def test_sql_add_columns_default(tmp_path, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    t = make_table(tmp_path, spark)
    eng = EngineSQL(spark, {"images": t})
    eng.sql(
        "ALTER TABLE images ADD COLUMNS "
        "(score double DEFAULT 0.25, note string)"
    )
    got = eng.sql(
        "SELECT count(*) AS n FROM images WHERE score = 0.25"
    ).first()["n"]
    assert got == 120
    assert (
        eng.sql("SELECT count(*) AS n FROM images WHERE note IS NULL")
        .first()["n"]
        == 120
    )
