"""SQL command surface (EngineSQL): DML + maintenance statements
dispatch to the engine operators; SELECT passes through at the current
snapshot; bad grammar raises, never misparses."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import Table
from aws_medallion_datalake_spark.sqlcmd import (
    EngineSQL,
    SQLCommandError,
    parse_where,
)

N = 200


@pytest.fixture()
def eng(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "tbl"),
        SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "w", "h", "image_id", "ingest_date"],
    )
    t.commit("append", t.write_files(generate_images(spark, N, n_files=8)))
    return EngineSQL(spark, {"images": t})


def test_parse_where_grammar():
    assert parse_where("w >= 10 AND fmt = 'png'") == [
        ("w", ">=", 10), ("fmt", "=", "png")
    ]
    assert parse_where("phash BETWEEN 5 AND 9") == [("phash", "between", (5, 9))]
    assert parse_where("fmt IN ('a', 'b') AND w <= 1.5") == [
        ("fmt", "in", ["a", "b"]), ("w", "<=", 1.5)
    ]
    assert parse_where("caption IS NULL AND w IS NOT NULL") == [
        ("caption", "isnull", None), ("w", "notnull", None)
    ]
    with pytest.raises(SQLCommandError):
        parse_where("w > 10")  # > unsupported: pruner ops only
    with pytest.raises(SQLCommandError):
        parse_where("w >= 10 OR w <= 2")


def test_sql_update_and_select(eng, spark):
    t = eng.tables["images"]
    lo = t.scan(spark).agg(F.min("w")).first()[0]
    res = eng.sql(
        f"UPDATE images SET caption = upper(caption) WHERE w = {lo}"
    ).first()
    n = t.scan(spark).filter(F.col("w") == lo).count()
    assert res["operation"] == "UPDATE" and res["rows_updated"] == n
    got = eng.sql(
        f"SELECT count(*) AS n FROM images WHERE caption = upper(caption) "
        f"AND w = {lo}"
    ).first()
    assert got["n"] == n


def test_sql_delete_refreshes_select_view(eng, spark):
    before = eng.sql("SELECT count(*) AS n FROM images").first()["n"]
    victim = eng.tables["images"].scan(spark).select("image_id").head()[0]
    res = eng.sql(f"DELETE FROM images WHERE image_id = '{victim}'").first()
    assert res["rows_deleted"] == 1
    # passthrough re-registers at the current snapshot
    after = eng.sql("SELECT count(*) AS n FROM images").first()["n"]
    assert after == before - 1


def test_sql_merge_with_view_source(eng, spark):
    src = generate_images(spark, 40, n_files=1, start=N - 20).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )
    src.createOrReplaceTempView("fixes")
    res = eng.sql("MERGE INTO images USING fixes ON image_id").first()
    assert res["rows_updated"] == 20 and res["rows_inserted"] == 20
    assert eng.sql(
        "SELECT count(*) AS n FROM images WHERE caption LIKE '%-v2'"
    ).first()["n"] == 40


def test_sql_optimize_compact_and_zorder(eng, spark):
    t = eng.tables["images"]
    n_before = len(t.manifest_pdf())
    res = eng.sql("OPTIMIZE images").first()
    assert res["operation"] == "OPTIMIZE"
    assert len(t.manifest_pdf()) <= n_before
    res2 = eng.sql("OPTIMIZE images ZORDER BY (phash, w, h)").first()
    assert res2["snapshot_id"] is not None
    assert t.snapshot().operation == "replace"
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == N


def test_sql_vacuum_and_analyze(eng, spark):
    t = eng.tables["images"]
    eng.sql("UPDATE images SET fmt = 'png' WHERE w >= 0")  # 2nd snapshot
    res = eng.sql("VACUUM images RETAIN 0 HOURS").first()
    assert res["snapshots_expired"] >= 1
    assert len(t.metadata().snapshots) == 1
    stats = eng.sql(
        "ANALYZE TABLE images COMPUTE STATISTICS FOR COLUMNS image_id, w"
    )
    rows = {r["column"]: r for r in stats.collect()}
    assert set(rows) == {"image_id", "w"}
    assert abs(rows["image_id"]["ndv"] - N) <= max(3, int(0.1 * N))
    assert t.column_stats() is not None


def test_sql_time_travel(eng, spark):
    t = eng.tables["images"]
    sid1 = t.snapshot().snapshot_id
    eng.sql("UPDATE images SET caption = upper(caption) WHERE w >= 0")
    n_upper = eng.sql(
        "SELECT count(*) AS n FROM images WHERE caption = upper(caption)"
    ).first()["n"]
    assert n_upper == N
    old = eng.sql(
        f"SELECT count(*) AS n FROM images VERSION AS OF {sid1} "
        f"WHERE caption = upper(caption)"
    ).first()["n"]
    assert old < N  # generator captions are not all-caps
    # timestamp form: epoch-seconds before the update sees the old state
    ts = t.snapshot(sid1).timestamp_ms / 1000.0
    old2 = eng.sql(
        f"SELECT count(*) AS n FROM images TIMESTAMP AS OF '{ts}' "
        f"WHERE caption = upper(caption)"
    ).first()["n"]
    assert old2 == old
    with pytest.raises(SQLCommandError, match="bad TIMESTAMP"):
        eng.sql("SELECT * FROM images TIMESTAMP AS OF 'yesterday-ish'")


def test_sql_errors(eng):
    with pytest.raises(SQLCommandError, match="unknown table"):
        eng.sql("UPDATE nope SET a = 1 WHERE b = 2")
    with pytest.raises(SQLCommandError, match="expected"):
        eng.sql("DELETE FROM images")  # no unguarded truncate
    with pytest.raises(SQLCommandError, match="expected"):
        eng.sql("VACUUM images RETAIN SOME HOURS")
    with pytest.raises(SQLCommandError, match="expected"):
        eng.sql("UPDATE images SET WHERE w = 1")
    with pytest.raises(SQLCommandError, match="cannot parse SET"):
        eng.sql("UPDATE images SET q q q WHERE w = 1")


def test_sql_insert_restore_describe_show(eng, spark):
    t = eng.tables["images"]
    sid0 = t.snapshot().snapshot_id
    # INSERT INTO ... SELECT with projection reorder + cast by name
    generate_images(spark, 30, n_files=1, start=7000).createOrReplaceTempView(
        "stage30"
    )
    res = eng.sql("INSERT INTO images SELECT * FROM stage30").first()
    assert res["operation"] == "INSERT" and res["rows_inserted"] == 30
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == N + 30
    with pytest.raises(SQLCommandError, match="lacks table columns"):
        eng.sql("INSERT INTO images SELECT image_id FROM stage30")
    # RESTORE to the pre-insert snapshot
    r = eng.sql(f"RESTORE TABLE images TO VERSION AS OF {sid0}").first()
    assert r["restored_to"] == sid0
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == N
    # DESCRIBE matches the declared schema
    desc = {row["col_name"]: row["data_type"] for row in
            eng.sql("DESCRIBE images").collect()}
    assert desc["image_id"] == "string" and desc["bytes"] == "binary"
    # SHOW TABLES / TBLPROPERTIES
    assert [r["table"] for r in eng.sql("SHOW TABLES").collect()] == ["images"]
    props = eng.sql("SHOW TBLPROPERTIES images")
    assert props.columns == ["key", "value"]


def test_sql_optimize_manifests(eng, spark):
    t = eng.tables["images"]
    for i in range(3):
        generate_images(spark, 10, n_files=1, start=8000 + i * 10)\
            .createOrReplaceTempView(f"s{i}")
        eng.sql(f"INSERT INTO images SELECT * FROM s{i}")
    n_manifests = len(t.snapshot().manifest_paths)
    assert n_manifests > 1  # delta-append chain
    res = eng.sql("OPTIMIZE images MANIFESTS").first()
    assert res["operation"] == "OPTIMIZE MANIFESTS"
    assert len(t.snapshot().manifest_paths) == 1
    assert eng.sql("SELECT count(*) AS n FROM images").first()["n"] == N + 30


def test_sql_create_table_and_insert(eng, spark, tmp_path):
    res = eng.sql(
        f"CREATE TABLE t2 (id string, v double, ts timestamp) "
        f"PARTITIONED BY (bucket(4, id)) STATS BY (id, v) "
        f"LOCATION '{tmp_path / 't2'}' "
        f"TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')"
    ).first()
    assert res["operation"] == "CREATE TABLE" and res["table"] == "t2"
    t2 = eng.tables["t2"]
    assert t2.metadata().partition_cols == ["bucket(4, id)"]
    assert t2.metadata().properties["write.merge.mode"] == "merge-on-read"
    spark.sql(
        "SELECT concat('k', id) AS id, id * 1.5 AS v, "
        "timestamp'2026-01-02 03:04:05' AS ts FROM range(50)"
    ).createOrReplaceTempView("src50")
    eng.sql("INSERT INTO t2 SELECT * FROM src50")
    assert eng.sql("SELECT count(*) AS n FROM t2").first()["n"] == 50


def test_sql_ctas(eng, spark, tmp_path):
    res = eng.sql(
        f"CREATE TABLE wide LOCATION '{tmp_path / 'wide'}' "
        f"AS SELECT image_id, w, h FROM images WHERE w >= 100"
    ).first()
    assert res["detail"].startswith("created, ")
    exp = eng.sql(
        "SELECT count(*) AS n FROM images WHERE w >= 100"
    ).first()["n"]
    assert eng.sql("SELECT count(*) AS n FROM wide").first()["n"] == exp
    # derived schema matches the query's
    cols = {r["col_name"]: r["data_type"]
            for r in eng.sql("DESCRIBE wide").collect()}
    assert cols == {"image_id": "string", "w": "int", "h": "int"}


def test_sql_alter_columns(eng, spark):
    eng.sql("ALTER TABLE images ADD COLUMNS (license string, score double)")
    cols = {r["col_name"] for r in eng.sql("DESCRIBE images").collect()}
    assert {"license", "score"} <= cols
    # pre-evolution files read the new columns as NULL
    got = eng.sql(
        "SELECT count(*) AS n FROM images WHERE license IS NULL"
    ).first()["n"]
    assert got == N
    eng.sql("ALTER TABLE images RENAME COLUMN license TO rights")
    eng.sql("ALTER TABLE images DROP COLUMN score")
    cols = {r["col_name"] for r in eng.sql("DESCRIBE images").collect()}
    assert "rights" in cols and "license" not in cols and "score" not in cols


def test_sql_tblproperties_roundtrip(eng):
    eng.sql("ALTER TABLE images SET TBLPROPERTIES ('a' = '1', 'b' = 'x')")
    props = {r["key"]: r["value"]
             for r in eng.sql("SHOW TBLPROPERTIES images").collect()}
    assert props["a"] == "1" and props["b"] == "x"
    eng.sql("ALTER TABLE images UNSET TBLPROPERTIES ('a')")
    props = {r["key"]: r["value"]
             for r in eng.sql("SHOW TBLPROPERTIES images").collect()}
    assert "a" not in props and props["b"] == "x"
    with pytest.raises(ValueError):  # managed refs refused
        eng.sql("ALTER TABLE images SET TBLPROPERTIES ('ref.x' = '1')")


def test_sql_set_partition_spec(eng):
    eng.sql("ALTER TABLE images SET PARTITION SPEC (fmt, days(ingest_date))")
    t = eng.tables["images"]
    assert t.metadata().partition_cols == ["fmt", "days(ingest_date)"]


def test_sql_drop_table(eng, tmp_path):
    import os

    root = str(tmp_path / "t3")
    eng.sql(f"CREATE TABLE t3 (id string) LOCATION '{root}'")
    res = eng.sql("DROP TABLE t3").first()
    assert res["detail"] == "detached" and "t3" not in eng.tables
    assert os.path.isdir(root)  # data untouched without PURGE
    from aws_medallion_datalake_spark.sources.tableformat import Table as T

    eng.tables["t3"] = T.load(root)  # re-attachable
    eng.sql("DROP TABLE t3 PURGE")
    assert not os.path.exists(root)


def test_sql_ddl_errors(eng, tmp_path):
    for bad in [
        "CREATE TABLE images (id string) LOCATION '/x'",  # exists
        "CREATE TABLE nx (id string)",                     # no LOCATION
        f"CREATE TABLE nx LOCATION '{tmp_path / 'nx'}'",   # no cols, no AS
        "ALTER TABLE images FROBNICATE",
        "DROP TABLE missing",
    ]:
        with pytest.raises(SQLCommandError):
            eng.sql(bad)


def test_call_procedures(eng, spark):
    """Iceberg stored-procedure spelling drives the same operators."""
    t = eng.tables["images"]
    # fragment the table so rewrite_data_files has work
    t.commit("append", t.write_files(generate_images(spark, 50, n_files=5)))
    res = eng.sql("CALL system.rewrite_data_files(table => 'images')").first()
    assert res["operation"] == "CALL rewrite_data_files"
    assert t.scan(spark).count() == N + 50

    res = eng.sql(
        "CALL system.rewrite_data_files('images', 'sort')"
    ).first()
    assert res["operation"] == "CALL rewrite_data_files"

    sid = t.snapshot().snapshot_id
    eng.sql("CALL system.create_tag('images', 'v1')")
    assert "v1" in t.tags()

    eng.sql(f"CALL system.create_branch(table => 'images', branch => 'b1', snapshot_id => {sid})")
    res = eng.sql("CALL system.fast_forward('images', 'b1')").first()
    assert res["branch"] == "b1"

    res = eng.sql(
        "CALL system.expire_snapshots(table => 'images', retain_last => 1)"
    ).first()
    assert res["operation"] == "CALL expire_snapshots"
    # tagged snapshot survives expiry; current scan unchanged
    assert t.scan(spark).count() == N + 50

    res = eng.sql("CALL system.remove_orphan_files('images')").first()
    assert res["orphan_files_deleted"] == 0

    hist = eng.sql("CALL system.ancestors_of('images')")
    assert hist.count() >= 1

    with pytest.raises(SQLCommandError):
        eng.sql("CALL system.no_such_proc('images')")
    with pytest.raises(SQLCommandError):
        eng.sql("CALL system.rollback_to_snapshot('images')")


def test_call_rollback(eng, spark):
    t = eng.tables["images"]
    s0 = t.snapshot().snapshot_id
    t.commit("append", t.write_files(generate_images(spark, 30, n_files=2)))
    assert t.scan(spark).count() == N + 30
    res = eng.sql(
        f"CALL system.rollback_to_snapshot('images', {s0})"
    ).first()
    assert res["restored_to"] == s0
    assert t.scan(spark).count() == N


def test_expire_honors_retention_properties(eng, spark):
    """Iceberg history.expire.* table properties drive unparameterized
    expiry (explicit args still win)."""
    from aws_medallion_datalake_spark.operators import expire_snapshots

    t = eng.tables["images"]
    for _ in range(3):
        t.commit("append", t.write_files(generate_images(spark, 10, n_files=1)))
    t.set_properties({"history.expire.min-snapshots-to-keep": "3"})
    res = expire_snapshots(t, spark=spark)
    assert len(res["retained_snapshots"]) == 3
    # explicit argument overrides the property
    res = expire_snapshots(t, spark=spark, keep_last=2)
    assert len(res["retained_snapshots"]) == 2


def test_truncate_and_insert_overwrite(eng, spark):
    t = eng.tables["images"]
    s0 = t.snapshot().snapshot_id
    generate_images(spark, 40, n_files=2, start=5000).createOrReplaceTempView(
        "fresh"
    )
    res = eng.sql("INSERT OVERWRITE images SELECT * FROM fresh").first()
    assert res["operation"] == "INSERT OVERWRITE"
    assert res["rows_inserted"] == 40
    assert t.scan(spark).count() == 40
    # snapshot isolation: the pre-overwrite state is still readable
    assert t.scan(spark, snapshot_id=s0).count() == N

    res = eng.sql("TRUNCATE TABLE images").first()
    assert res["rows_deleted"] == 40
    assert t.scan(spark).count() == 0
    assert t.scan(spark, snapshot_id=s0).count() == N
    with pytest.raises(SQLCommandError):
        eng.sql("TRUNCATE images")
