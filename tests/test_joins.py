"""asof_join / range_join semantics (operators/joins.py).

Beyond the reference's equi-join surface (SURVEY §2.3); semantics are
checked against hand-computed matches including the deterministic
tie-break and tolerance contracts the entry oracles rely on.
"""

import datetime as dt

from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.joins import asof_join, range_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_backward_match_and_left_semantics(spark):
    trades = spark.createDataFrame(
        [(1, _ts(5), "t1"), (1, _ts(2), "t2"), (2, _ts(3), "t3"), (3, _ts(4), "t4")],
        "k long, t timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(4), 11.0), (1, _ts(6), 12.0), (2, _ts(3), 20.0)],
        "k long, qt timestamp, px double",
    )
    out = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="k", left_time="t", right_time="qt",
            payload_cols=["px"],
        ).collect()
    }
    # latest quote <= trade time; exact-time match included; no quote → NULL
    assert out == {"t1": 11.0, "t2": 10.0, "t3": 20.0, "t4": None}


def test_asof_tie_break_is_greatest_payload(spark):
    left = spark.createDataFrame([(1, _ts(5), "x")], "k long, t timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(3), 7), (1, _ts(3), 9), (1, _ts(3), 8)],
        "k long, rt timestamp, rid int",
    )
    [row] = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload_cols=["rid"]
    ).collect()
    assert row["rid"] == 9


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "near"), (1, _ts(20), "far")], "k long, t timestamp, tag string"
    )
    right = spark.createDataFrame([(1, _ts(9), 1.5)], "k long, rt timestamp, v double")
    out = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["v"], tolerance=F.expr("INTERVAL 3 DAYS"),
        ).collect()
    }
    assert out == {"near": 1.5, "far": None}


def test_asof_preserves_all_left_columns_and_rows(spark):
    left = spark.createDataFrame(
        [(i % 3, _ts(1 + i % 20, i % 24), i, f"p{i}") for i in range(200)],
        "k long, t timestamp, n long, name string",
    )
    right = spark.createDataFrame(
        [(i % 3, _ts(1 + i % 15), float(i)) for i in range(60)],
        "k long, rt timestamp, v double",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload_cols=["v"]
    )
    assert out.columns == ["k", "t", "n", "name", "v"]
    assert out.count() == 200
    assert out.select("n").distinct().count() == 200


def test_range_join_numeric_exact_semantics(spark):
    points = spark.createDataFrame(
        [(float(p), f"p{p}") for p in range(0, 100, 3)], "x double, pid string"
    )
    intervals = spark.createDataFrame(
        [(0.0, 10.0, "a"), (9.0, 9.5, "b"), (50.0, 120.0, "c"), (200.0, 210.0, "d")],
        "lo double, hi double, iid string",
    )
    got = {
        (r["iid"], r["pid"])
        for r in range_join(
            points, intervals, point_col="x", start_col="lo", end_col="hi",
            bucket_width=10.0,
        ).collect()
    }
    want = {
        (iid, f"p{p}")
        for (lo, hi, iid) in [(0, 10, "a"), (9, 9.5, "b"), (50, 120, "c")]
        for p in range(0, 100, 3)
        if lo <= p < hi
    }
    assert got == want
    # half-open: hi boundary excluded, lo included
    assert ("a", "p0") in got


def test_range_join_timestamps_and_keys(spark):
    points = spark.createDataFrame(
        [(1, _ts(d), d) for d in range(1, 20)] + [(2, _ts(5), 99)],
        "uid long, at timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [(1, _ts(3), _ts(6), "w1"), (1, _ts(10), _ts(11), "w2"), (2, _ts(1), _ts(4), "w3")],
        "uid long, s timestamp, e timestamp, wid string",
    )
    got = {
        (r["wid"], r["pid"])
        for r in range_join(
            points, intervals, point_col="at", start_col="s", end_col="e",
            bucket_width=2 * 86400, keys=["uid"],
        ).collect()
    }
    assert got == {("w1", 3), ("w1", 4), ("w1", 5), ("w2", 10)}


# ---------- bucketed (storage-partitioned) join ----------


def _bucketed_table(tmp_path, spark, name, n, start=0, caption_suffix=""):
    from pyspark.sql import functions as F

    from aws_medallion_datalake_spark.operators.cluster import route_exact
    from aws_medallion_datalake_spark.sources import transforms
    from aws_medallion_datalake_spark.sources.generator import (
        SCHEMA,
        generate_images,
    )
    from aws_medallion_datalake_spark.sources.tableformat import Table

    t = Table.create(
        str(tmp_path / name),
        SCHEMA,
        partition_cols=["bucket(8, image_id)"],
        stats_cols=["phash", "image_id"],
    )
    df = generate_images(spark, n, n_files=4, start=start)
    if caption_suffix:
        df = df.withColumn(
            "caption", F.concat(F.col("caption"), F.lit(caption_suffix))
        )
    tf = transforms.parse("bucket(8, image_id)")
    t.commit("append", t.write_files(route_exact(df, tf.expr(), 8)))
    return t


def test_bucketed_join_matches_plain_join(tmp_path, spark):
    from aws_medallion_datalake_spark.operators.joins import bucketed_join

    ta = _bucketed_table(tmp_path, spark, "a", 200)
    tb = _bucketed_table(tmp_path, spark, "b", 120, start=100, caption_suffix="-b")
    got = bucketed_join(
        ta, tb, spark, key="image_id",
        columns_a=["image_id", "w", "caption"],
        columns_b=["image_id", "fmt"],
    ).toPandas()
    a = ta.scan(spark).select("image_id", "w", "caption")
    b = tb.scan(spark).select("image_id", "fmt")
    exp = a.join(b, "image_id", "inner").toPandas()
    assert len(got) == len(exp) == 100
    assert sorted(got["image_id"]) == sorted(exp["image_id"])
    # b-side captions carry the suffix; join kept a-side caption column
    assert got["caption"].str.endswith("-b").sum() == 0

    # per-bucket broadcast: no sort-merge join, no full-side shuffle
    plan = bucketed_join(
        ta, tb, spark, key="image_id",
        columns_a=["image_id", "w"], columns_b=["image_id", "caption"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_left_and_errors(tmp_path, spark):
    import pytest as _pytest

    from aws_medallion_datalake_spark.operators.joins import bucketed_join
    from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
    from aws_medallion_datalake_spark.sources.tableformat import Table

    ta = _bucketed_table(tmp_path, spark, "la", 150)
    tb = _bucketed_table(tmp_path, spark, "lb", 50, start=120, caption_suffix="-b")
    got = bucketed_join(
        ta, tb, spark, key="image_id", how="left",
        columns_a=["image_id", "w"], columns_b=["image_id", "fmt"],
    ).toPandas()
    assert len(got) == 150
    assert got["fmt"].notna().sum() == 30  # ids 120-149 overlap
    # mismatched bucket count
    t16 = Table.create(
        str(tmp_path / "n16"), SCHEMA, partition_cols=["bucket(16, image_id)"]
    )
    t16.commit("append", t16.write_files(generate_images(spark, 20, n_files=1)))
    with _pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_join(ta, t16, spark, key="image_id")
    # no bucket spec at all
    plain = Table.create(str(tmp_path / "plain"), SCHEMA)
    plain.commit("append", plain.write_files(generate_images(spark, 20, n_files=1)))
    with _pytest.raises(ValueError, match="no bucket"):
        bucketed_join(ta, plain, spark, key="image_id")
