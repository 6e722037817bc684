"""Metadata-only aggregates: COUNT(*)/MIN/MAX from manifest stats
(Iceberg metadata-count analogue; reference runs COUNT(*) health checks
over every gold table — sql/athena_gold_queries.sql)."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators import (
    delete_where,
    fast_count,
    fast_min_max,
)
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
)
from aws_medallion_datalake_spark.sources.tableformat import Table

STATS = ["phash", "w", "h", "image_id"]


def make_table(tmp_path, spark, n=400, n_files=16) -> Table:
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    t.commit(
        "append",
        t.write_files(generate_images(spark, n, n_files=n_files, n_dates=2)),
    )
    return t


def test_count_star_no_scan(tmp_path, spark):
    t = make_table(tmp_path, spark)
    # zero data IO, no SparkSession at all
    assert fast_count(t, spark=None) == 400
    assert fast_count(t, spark=None) == t.scan(spark).count()


def test_count_empty_table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "empty"), schema_ddl=SCHEMA,
        partition_cols=[], stats_cols=STATS,
    )
    assert fast_count(t, spark=None) == 0


def test_predicated_count_hybrid(tmp_path, spark):
    """A range predicate: fully-covered files counted from the manifest,
    boundary files scanned — result equals the real filter count."""
    t = make_table(tmp_path, spark)
    lo, hi = (int(v) for v in fast_min_max(t, "phash"))
    mid_lo = lo + (hi - lo) // 4
    mid_hi = hi - (hi - lo) // 4
    preds = [("phash", "between", (mid_lo, mid_hi))]
    expect = t.scan(spark).filter(
        F.col("phash").between(mid_lo, mid_hi)
    ).count()
    assert fast_count(t, spark, preds) == expect
    # a strict sub-range of the table's hash space needs boundary scans
    with pytest.raises(ValueError, match="scan is required"):
        fast_count(t, spark=None, predicates=preds)


def test_predicated_count_full_containment(tmp_path, spark):
    """A predicate covering the entire column range is provable from
    stats alone — no SparkSession needed even with a WHERE."""
    t = make_table(tmp_path, spark)
    lo, hi = (int(v) for v in fast_min_max(t, "phash"))
    assert (
        fast_count(t, spark=None, predicates=[("phash", "between", (lo, hi))])
        == 400
    )
    assert fast_count(t, spark=None, predicates=[("phash", ">=", lo)]) == 400
    assert fast_count(t, spark, [("phash", ">=", hi + 1)]) == 0


def test_count_with_nulls(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "nulls"), schema_ddl=SCHEMA,
        partition_cols=["ingest_date"], stats_cols=STATS,
    )
    df = generate_images(spark, 300, n_files=8).withColumn(
        "phash",
        F.when(F.crc32(F.col("image_id")) % 3 == 0, None).otherwise(
            F.col("phash")
        ),
    )
    t.commit("append", t.write_files(df))
    n_null = t.scan(spark).filter(F.col("phash").isNull()).count()
    assert 0 < n_null < 300
    assert fast_count(t, spark, [("phash", "isnull", None)]) == n_null
    assert fast_count(t, spark, [("phash", "notnull", None)]) == 300 - n_null
    # nulls fail comparisons: a whole-range BETWEEN only counts non-nulls
    lo, hi = (int(v) for v in fast_min_max(t, "phash"))
    assert (
        fast_count(t, spark, [("phash", "between", (lo, hi))]) == 300 - n_null
    )


def test_pending_mor_deletes_fall_back(tmp_path, spark):
    t = make_table(tmp_path, spark)
    a_date = t.scan(spark).select("ingest_date").first()["ingest_date"]
    delete_where(
        t, spark, [("ingest_date", "=", a_date)], mode="merge-on-read"
    )
    real = t.scan(spark).count()
    assert real < 400
    assert fast_count(t, spark) == real
    with pytest.raises(ValueError, match="pending merge-on-read"):
        fast_count(t, spark=None)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        fast_min_max(t, "phash")


def test_min_max_matches_scan(tmp_path, spark):
    t = make_table(tmp_path, spark)
    row = t.scan(spark).agg(
        F.min("phash"), F.max("phash"), F.min("w"), F.max("w")
    ).first()
    assert fast_min_max(t, "phash") == (row[0], row[1])
    assert fast_min_max(t, "w") == (row[2], row[3])
    with pytest.raises(ValueError, match="no manifest stats"):
        fast_min_max(t, "caption")


def test_sql_count_star_uses_metadata(tmp_path, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    t = make_table(tmp_path, spark)
    eng = EngineSQL(spark, {"images": t})
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == 400
    lo, hi = (int(v) for v in fast_min_max(t, "phash"))
    mid = lo + (hi - lo) // 2
    got = eng.sql(
        f"SELECT count(*) AS n FROM images WHERE phash <= {mid}"
    ).first()["n"]
    assert got == t.scan(spark).filter(F.col("phash") <= mid).count()
    # unprovable WHERE shapes still answer correctly via passthrough
    got = eng.sql(
        "SELECT count(*) AS n FROM images WHERE caption = upper(caption)"
    ).first()["n"]
    assert got == t.scan(spark).filter("caption = upper(caption)").count()
    # default Spark column name preserved when no alias is given
    assert eng.sql("SELECT count(*) FROM images").columns == ["count(1)"]
