"""Materialized views: create, incremental refresh (append-only chains),
full-recompute fallback, bookmark bump for physical-only chains, SQL
surface."""

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.matview import (
    MV_BASE_SNAPSHOT_PROP,
    create_matview,
    parse_mv_query,
    refresh_matview,
)
from aws_medallion_datalake_spark.sources.generator import (
    SCHEMA,
    generate_images,
    generate_updates,
)
from aws_medallion_datalake_spark.sources.tableformat import Table

QUERY = (
    "SELECT fmt, count(*) AS n, sum(w) AS total_w, "
    "min(phash) AS min_ph, max(phash) AS max_ph "
    "FROM imgs GROUP BY fmt"
)


def _mk_base(tmp_path, spark, rows=60):
    t = Table.create(
        str(tmp_path / "base"), SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=["phash", "w", "h", "image_id"],
    )
    t.append(generate_images(spark, rows, n_files=3))
    return t


def _recompute(spark, base):
    return (
        base.scan(spark)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum("w").alias("total_w"),
            F.min("phash").alias("min_ph"),
            F.max("phash").alias("max_ph"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_parse_mv_query():
    base, groups, comb = parse_mv_query(QUERY)
    assert base == "imgs" and groups == ["fmt"]
    assert comb == {
        "fmt": "group", "n": "sum", "total_w": "sum",
        "min_ph": "min", "max_ph": "max",
    }
    with pytest.raises(ValueError, match="self-mergeable"):
        parse_mv_query("SELECT fmt, avg(w) AS aw FROM imgs GROUP BY fmt")
    with pytest.raises(ValueError, match="aggregate"):
        parse_mv_query("SELECT fmt FROM imgs GROUP BY fmt")
    with pytest.raises(ValueError, match="GROUP BY"):
        parse_mv_query("SELECT fmt, w, count(*) AS n FROM imgs GROUP BY fmt")
    # DISTINCT partials are not self-mergeable: summing distinct counts
    # across old state + delta would be silently wrong
    with pytest.raises(ValueError, match="self-mergeable"):
        parse_mv_query(
            "SELECT fmt, count(DISTINCT w) AS dw FROM imgs GROUP BY fmt"
        )
    with pytest.raises(ValueError, match="self-mergeable"):
        parse_mv_query(
            "SELECT fmt, sum( distinct w ) AS sw FROM imgs GROUP BY fmt"
        )


def test_full_refresh_repairs_rolled_back_base(tmp_path, spark):
    """After a base rollback the last→cur ancestry chain does not exist;
    refresh must fall back to a full recompute (repair), not raise."""
    base = _mk_base(tmp_path, spark)
    keep = int(base.snapshot().snapshot_id)
    mv = create_matview(
        spark, "imgs_by_fmt", QUERY, str(tmp_path / "mv"), {"imgs": base}
    )
    base.append(generate_images(spark, 25, n_files=1, start=1000))
    refresh_matview(spark, mv, {"imgs": base})
    base.rollback(keep)  # MV bookmark now points off the live chain
    snap = refresh_matview(spark, mv, {"imgs": base}, full=True)
    assert snap.summary["refresh"] == "full"
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))
    # non-forced refresh on a rolled-back base also repairs via full
    base.append(generate_images(spark, 5, n_files=1, start=9000))
    base.rollback(keep)
    mv.set_properties({MV_BASE_SNAPSHOT_PROP: keep + 999})  # off-chain
    snap = refresh_matview(spark, mv, {"imgs": base})
    assert snap.summary["refresh"] == "full"
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))


def test_create_and_incremental_refresh(tmp_path, spark):
    base = _mk_base(tmp_path, spark)
    mv = create_matview(
        spark, "imgs_by_fmt", QUERY, str(tmp_path / "mv"), {"imgs": base}
    )
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))
    # fresh: no-op
    assert refresh_matview(spark, mv, {"imgs": base}) is None
    # append-only advance: incremental fold
    base.append(generate_images(spark, 25, n_files=1, start=1000))
    base.append(generate_images(spark, 10, n_files=1, start=2000))
    snap = refresh_matview(spark, mv, {"imgs": base})
    assert snap.summary["refresh"] == "incremental"
    assert int(snap.summary["base_snapshots_folded"]) == 2
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))
    assert int(mv.metadata().properties[MV_BASE_SNAPSHOT_PROP]) == int(
        base.snapshot().snapshot_id
    )


def test_physical_only_chain_bumps_bookmark(tmp_path, spark):
    from aws_medallion_datalake_spark.operators.compact import compact

    base = _mk_base(tmp_path, spark)
    mv = create_matview(
        spark, "imgs_by_fmt", QUERY, str(tmp_path / "mv"), {"imgs": base}
    )
    n_snaps = len(mv.metadata().snapshots)
    compact(base, spark, target_file_size_bytes=1 << 30)
    assert refresh_matview(spark, mv, {"imgs": base}) is None
    # bookmark advanced with NO new MV snapshot and no data IO
    assert len(mv.metadata().snapshots) == n_snaps
    assert int(mv.metadata().properties[MV_BASE_SNAPSHOT_PROP]) == int(
        base.snapshot().snapshot_id
    )
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))


def test_non_append_chain_falls_back_to_full(tmp_path, spark):
    from aws_medallion_datalake_spark.operators.merge import merge_into

    base = _mk_base(tmp_path, spark)
    mv = create_matview(
        spark, "imgs_by_fmt", QUERY, str(tmp_path / "mv"), {"imgs": base}
    )
    src = generate_updates(spark, 60, 10, 5, n_files=1)
    merge_into(base, spark, src)
    snap = refresh_matview(spark, mv, {"imgs": base})
    assert snap.summary["refresh"] == "full"
    assert _rows(mv.scan(spark)) == _rows(_recompute(spark, base))


def test_avg_mv_incremental_refresh(tmp_path, spark):
    """AVG auto-decomposition: hidden sum/cnt partials are materialized,
    fold incrementally across an append-only refresh, and the display
    frame recombines them at the position the user wrote the avg."""
    from aws_medallion_datalake_spark.operators.matview import (
        mv_display_frame,
        rewrite_avg_query,
    )

    q2, derived = rewrite_avg_query(
        "SELECT fmt, avg(w) AS avg_w, count(*) AS n FROM imgs GROUP BY fmt"
    )
    assert derived == {"avg_w": {"sum": "__avg_w_sum", "cnt": "__avg_w_cnt"}}
    assert "sum(w) AS __avg_w_sum" in q2 and "count(w) AS __avg_w_cnt" in q2
    # no-avg queries come back untouched
    assert rewrite_avg_query(QUERY) == (QUERY, {})
    with pytest.raises(ValueError, match="self-mergeable"):
        rewrite_avg_query(
            "SELECT fmt, avg(DISTINCT w) AS aw FROM imgs GROUP BY fmt"
        )

    base = _mk_base(tmp_path, spark)
    mv = create_matview(
        spark, "imgs_avg",
        "SELECT fmt, avg(w) AS avg_w, count(*) AS n FROM imgs GROUP BY fmt",
        str(tmp_path / "mva"), {"imgs": base},
    )
    # physical schema carries the partials; the display frame hides them
    assert set(mv.scan(spark).columns) == {
        "fmt", "__avg_w_sum", "__avg_w_cnt", "n"
    }
    def _expect():
        return base.scan(spark).groupBy("fmt").agg(
            F.avg("w").alias("avg_w"), F.count("*").alias("n")
        )

    disp = mv_display_frame(spark, mv)
    assert disp.columns == ["fmt", "avg_w", "n"]
    assert _rows(disp) == _rows(_expect())
    # append-only advance: the partials fold INCREMENTALLY (delta-only IO)
    base.append(generate_images(spark, 40, n_files=2, start=2000))
    snap = refresh_matview(spark, mv, {"imgs": base})
    assert snap.summary["refresh"] == "incremental"
    assert _rows(mv_display_frame(spark, mv)) == _rows(_expect())


def test_where_and_global_agg(tmp_path, spark):
    base = _mk_base(tmp_path, spark)
    q = "SELECT count(*) AS n, sum(h) AS total_h FROM imgs WHERE w >= 64"
    mv = create_matview(
        spark, "img_totals", q, str(tmp_path / "mv2"), {"imgs": base}
    )
    ref = base.scan(spark).filter("w >= 64").agg(
        F.count("*").alias("n"), F.sum("h").alias("total_h")
    )
    assert _rows(mv.scan(spark)) == _rows(ref)
    base.append(generate_images(spark, 30, n_files=1, start=5000))
    snap = refresh_matview(spark, mv, {"imgs": base})
    assert snap.summary["refresh"] == "incremental"
    ref2 = base.scan(spark).filter("w >= 64").agg(
        F.count("*").alias("n"), F.sum("h").alias("total_h")
    )
    assert _rows(mv.scan(spark)) == _rows(ref2)


def test_sql_surface(tmp_path, spark):
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL, SQLCommandError

    base = _mk_base(tmp_path, spark)
    eng = EngineSQL(spark, {"imgs": base})
    r = eng.sql(
        f"CREATE MATERIALIZED VIEW imgs_by_fmt LOCATION "
        f"'{tmp_path / 'mv3'}' AS {QUERY}"
    ).first()
    assert r["operation"] == "CREATE MATERIALIZED VIEW"
    # MV is a first-class catalog table: SELECT passthrough reads it
    got = eng.sql("SELECT sum(n) AS rows FROM imgs_by_fmt").first()
    assert got["rows"] == 60
    assert (
        eng.sql("REFRESH MATERIALIZED VIEW imgs_by_fmt").first()["detail"]
        == "fresh"
    )
    base.append(generate_images(spark, 12, n_files=1, start=7000))
    det = eng.sql("REFRESH MATERIALIZED VIEW imgs_by_fmt").first()["detail"]
    assert det.startswith("incremental")
    assert eng.sql("SELECT sum(n) AS rows FROM imgs_by_fmt").first()["rows"] == 72
    det = eng.sql("REFRESH MATERIALIZED VIEW imgs_by_fmt FULL").first()["detail"]
    assert det.startswith("full")
    # avg(DISTINCT …) stays refused; plain avg is auto-decomposed (below)
    with pytest.raises(SQLCommandError, match="self-mergeable"):
        eng.sql(
            f"CREATE MATERIALIZED VIEW bad LOCATION '{tmp_path / 'mv4'}' "
            f"AS SELECT fmt, avg(DISTINCT w) AS aw FROM imgs GROUP BY fmt"
        )
    eng.sql("DROP MATERIALIZED VIEW imgs_by_fmt")
    assert "imgs_by_fmt" not in eng.tables


def test_avg_mv_sql_surface(tmp_path, spark):
    """SQL end-to-end for auto-decomposed AVG: the registered view shows
    the avg column (hidden partials never leak), incremental refresh
    keeps it equal to a full recompute."""
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    base = _mk_base(tmp_path, spark)
    eng = EngineSQL(spark, {"imgs": base})
    eng.sql(
        f"CREATE MATERIALIZED VIEW fmt_stats LOCATION '{tmp_path / 'mva'}' "
        f"AS SELECT fmt, avg(w) AS avg_w, count(*) AS n "
        f"FROM imgs GROUP BY fmt"
    )
    got = eng.sql("SELECT * FROM fmt_stats")
    assert got.columns == ["fmt", "avg_w", "n"]
    ref = base.scan(spark).groupBy("fmt").agg(
        F.avg("w").alias("avg_w"), F.count("*").alias("n")
    )
    assert _rows(got) == _rows(ref)
    base.append(generate_images(spark, 30, n_files=1, start=4000))
    det = eng.sql("REFRESH MATERIALIZED VIEW fmt_stats").first()["detail"]
    assert det.startswith("incremental")
    ref2 = base.scan(spark).groupBy("fmt").agg(
        F.avg("w").alias("avg_w"), F.count("*").alias("n")
    )
    assert _rows(eng.sql("SELECT * FROM fmt_stats")) == _rows(ref2)
