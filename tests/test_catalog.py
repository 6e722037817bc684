"""File-backed catalog: durable name→root registry, CAS mutations,
EngineSQL DDL persistence across sessions."""

import threading

import pytest

from aws_medallion_datalake_spark.sources.catalog import Catalog
from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table
from aws_medallion_datalake_spark.sqlcmd import EngineSQL


def _mk_table(tmp_path, spark, name, n=20):
    t = Table.create(
        str(tmp_path / name), SCHEMA, stats_cols=["phash", "image_id"]
    )
    t.commit("append", t.write_files(generate_images(spark, n, n_files=1)))
    return t


def test_catalog_roundtrip_and_persistence(tmp_path, spark):
    cat = Catalog(str(tmp_path / "cat"))
    t = _mk_table(tmp_path, spark, "t1")
    cat["bronze.images"] = t
    assert "bronze.images" in cat
    assert list(cat) == ["bronze.images"]
    # a FRESH instance (new process analogue) resolves the same entry
    cat2 = Catalog(str(tmp_path / "cat"))
    assert cat2["bronze.images"].root == t.root
    assert cat2["bronze.images"].scan(spark).count() == 20
    del cat2["bronze.images"]
    assert len(Catalog(str(tmp_path / "cat"))) == 0
    with pytest.raises(KeyError):
        del cat2["bronze.images"]


def test_catalog_concurrent_registrations_all_land(tmp_path, spark):
    cat = Catalog(str(tmp_path / "cat"))
    tables = [_mk_table(tmp_path, spark, f"t{i}", n=5) for i in range(6)]
    errs = []

    def put(i):
        try:
            Catalog(str(tmp_path / "cat"))[f"tbl{i}"] = tables[i]
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=put, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert len(Catalog(str(tmp_path / "cat"))) == 6


def test_engine_sql_ddl_persists_through_catalog(tmp_path, spark):
    cat_dir = str(tmp_path / "cat")
    eng = EngineSQL(spark, Catalog(cat_dir))
    eng.sql(
        f"CREATE TABLE gold_t (id string, v double) "
        f"LOCATION '{tmp_path / 'gold_t'}'"
    )
    # a SECOND session over the same catalog sees the table
    eng2 = EngineSQL(spark, Catalog(cat_dir))
    assert eng2.sql("SHOW TABLES").first()["table"] == "gold_t"
    eng2.sql("INSERT INTO gold_t SELECT 'a' AS id, 1.5 AS v")
    assert eng.sql("SELECT count(*) AS n FROM gold_t").first()["n"] == 1
    eng2.sql("DROP TABLE gold_t")
    assert "gold_t" not in Catalog(cat_dir)


def test_sql_metadata_views_on_demand(tmp_path, spark):
    t = _mk_table(tmp_path, spark, "mv", n=30)
    eng = EngineSQL(spark, {"images": t})
    row = eng.sql(
        "SELECT count(*) AS files, sum(record_count) AS recs "
        "FROM images_files"
    ).first()
    assert row["recs"] == 30
    snaps = eng.sql(
        "SELECT count(*) AS n FROM images_snapshots"
    ).first()["n"]
    assert snaps == 1
    parts = eng.sql(
        "SELECT * FROM images_partitions"
    ).collect()
    assert sum(r["record_count"] for r in parts) == 30


def test_sql_engine_functions_registered(tmp_path, spark):
    t = _mk_table(tmp_path, spark, "fx", n=10)
    eng = EngineSQL(spark, {"images": t})
    rows = eng.sql(
        "SELECT image_id, phash64(bytes) AS ph, morton64(phash, w, h) AS mk, "
        "decode_ok(bytes, w, h) AS ok FROM images LIMIT 5"
    ).collect()
    assert len(rows) == 5
    assert all(r["ok"] for r in rows)
    assert all(r["ph"] == next(
        x["phash"] for x in t.scan(spark).collect()
        if x["image_id"] == r["image_id"]
    ) for r in rows)


def test_sql_copy_into_adopts_files(tmp_path, spark):
    t = _mk_table(tmp_path, spark, "ci", n=20)
    ext = str(tmp_path / "external")
    generate_images(spark, 15, n_files=2, start=7000).write.parquet(ext)
    eng = EngineSQL(spark, {"images": t})
    res = eng.sql(f"COPY INTO images FROM '{ext}' FILEFORMAT = PARQUET").first()
    assert res["operation"] == "COPY INTO"
    assert t.scan(spark).count() == 35
    # adopted, not rewritten: the external files still exist untouched
    import glob as _g

    assert len(_g.glob(ext + "/*.parquet")) == 2


def test_sql_describe_detail_restore_ts_write_order(tmp_path, spark):
    import time as _time

    t = _mk_table(tmp_path, spark, "dd", n=25)
    eng = EngineSQL(spark, {"images": t})
    d = eng.sql("DESCRIBE DETAIL images").first()
    assert d["num_records"] == 25 and d["num_files"] >= 1
    assert d["location"] == t.root

    eng.sql("ALTER TABLE images WRITE ORDERED BY (morton(phash, w, h))")
    props = t.metadata().properties
    assert props["write.distribution-mode"] == "range"
    assert props["sort.order"] == "morton(phash, w, h)"
    eng.sql("ALTER TABLE images WRITE UNORDERED")
    assert "sort.order" not in t.metadata().properties

    s0 = t.snapshot().snapshot_id
    ts_after_s0 = t.snapshot().timestamp_ms / 1000.0 + 0.001
    _time.sleep(0.01)
    t.commit(
        "append", t.write_files(generate_images(spark, 5, n_files=1, start=900))
    )
    assert t.scan(spark).count() == 30
    res = eng.sql(
        f"RESTORE TABLE images TO TIMESTAMP AS OF '{ts_after_s0}'"
    ).first()
    assert res["restored_to"] == s0
    assert t.scan(spark).count() == 25


def test_catalog_self_repairs_missing_hint(tmp_path, spark):
    import os

    cat_dir = str(tmp_path / "cat")
    cat = Catalog(cat_dir)
    cat["a"] = _mk_table(tmp_path, spark, "sr", n=5)
    os.remove(os.path.join(cat_dir, "version-hint.text"))
    # a fresh instance recovers the newest version instead of crashing
    cat2 = Catalog(cat_dir)
    assert "a" in cat2
    assert len(cat2) == 1


def test_catalog_missing_delete_does_not_churn_versions(tmp_path, spark):
    cat_dir = str(tmp_path / "cat")
    cat = Catalog(cat_dir)
    v0 = cat._current_version()
    with pytest.raises(KeyError):
        del cat["nope"]
    assert cat._current_version() == v0  # no version written


def test_write_order_ddl_validation(tmp_path, spark):
    from aws_medallion_datalake_spark.operators.cluster import cluster
    from aws_medallion_datalake_spark.sqlcmd import SQLCommandError

    t = _mk_table(tmp_path, spark, "wo", n=30)
    eng = EngineSQL(spark, {"images": t})
    with pytest.raises(SQLCommandError, match="unknown columns"):
        eng.sql("ALTER TABLE images WRITE ORDERED BY (nope)")
    with pytest.raises(SQLCommandError, match="bad write order"):
        eng.sql("ALTER TABLE images WRITE ORDERED BY (lower(fmt))")
    # a plain linear order is legal and bare OPTIMIZE still works
    eng.sql("ALTER TABLE images WRITE LOCALLY ORDERED BY (ingest_date, image_id)")
    assert t.metadata().properties["sort.order"] == "ingest_date, image_id"
    cluster(t, spark, target_file_size_bytes=1 << 26)  # falls back to default curve
    assert t.scan(spark).count() == 30


def test_named_queries_durable_roundtrip(tmp_path, spark):
    """CREATE/EXECUTE/SHOW/DROP NAMED QUERY — the Athena workgroup
    named-query surface — persisted through the file catalog and
    visible from a second session."""
    from aws_medallion_datalake_spark.sqlcmd import SQLCommandError

    cat_dir = str(tmp_path / "cat")
    cat = Catalog(cat_dir)
    t = _mk_table(tmp_path, spark, "imgs", n=25)
    cat["imgs"] = t
    eng = EngineSQL(spark, cat)
    r = eng.sql(
        "CREATE NAMED QUERY fmt_counts AS "
        "SELECT fmt, count(*) AS n FROM imgs GROUP BY fmt"
    ).first()
    assert r["operation"] == "CREATE NAMED QUERY"
    got = eng.sql("EXECUTE fmt_counts")
    assert got.agg({"n": "sum"}).first()[0] == 25
    # durable: a FRESH session over the same catalog dir executes it
    eng2 = EngineSQL(spark, Catalog(cat_dir))
    assert eng2.sql("EXECUTE fmt_counts").agg({"n": "sum"}).first()[0] == 25
    names = [x["name"] for x in eng2.sql("SHOW NAMED QUERIES").collect()]
    assert names == ["fmt_counts"]
    # named queries never shadow the table mapping
    assert list(Catalog(cat_dir)) == ["imgs"]
    # duplicate create refused; OR REPLACE allowed
    with pytest.raises(SQLCommandError, match="already exists"):
        eng2.sql("CREATE NAMED QUERY fmt_counts AS SELECT 1 AS one")
    eng2.sql("CREATE OR REPLACE NAMED QUERY fmt_counts AS SELECT 1 AS one")
    assert eng.sql("EXECUTE fmt_counts").first()["one"] == 1
    eng.sql("DROP NAMED QUERY fmt_counts")
    with pytest.raises(SQLCommandError, match="unknown named query"):
        eng2.sql("EXECUTE fmt_counts")
    # session-local fallback for a plain-dict catalog
    eng3 = EngineSQL(spark, {"imgs": t})
    eng3.sql("CREATE NAMED QUERY q AS SELECT count(*) AS n FROM imgs")
    assert eng3.sql("EXECUTE q").first()["n"] == 25
    eng3.sql("DROP NAMED QUERY q")
