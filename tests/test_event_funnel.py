"""Semantic test for the ordered-step funnel entry: step k only counts
at or after the user's earliest qualifying step k-1 time."""

import datetime as dt
import os

import __spark_entry__ as entry


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    return str(tmp_path)


def test_funnel_respects_step_order(spark, tmp_path):
    t = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> purchase in order: full conversion
        (1, t(0), 1, "view", 1.0, "{}"),
        (2, t(1), 1, "click", 1.0, "{}"),
        (3, t(2), 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE first view, purchase after -> click step
        # never qualifies, so purchase can't either
        (4, t(0), 2, "click", 1.0, "{}"),
        (5, t(1), 2, "view", 1.0, "{}"),
        (6, t(2), 2, "purchase", 1.0, "{}"),
        # user 3: view only
        (7, t(0), 3, "view", 1.0, "{}"),
        # user 4: purchase BEFORE click: view -> click ok, purchase not
        (8, t(0), 4, "view", 1.0, "{}"),
        (9, t(1), 4, "purchase", 1.0, "{}"),
        (10, t(2), 4, "click", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = entry.q_event_funnel(spark, sf).collect()[0]
    assert r["n_users"] == 4
    assert r["step_view"] == 4
    assert r["step_click"] == 2  # users 1 and 4
    assert r["step_purchase"] == 1  # user 1 only
    assert r["view_to_purchase_rate"] == 0.25


def test_same_timestamp_counts_as_qualifying(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        (3, t0, 1, "purchase", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = entry.q_event_funnel(spark, sf).collect()[0]
    assert (r["step_view"], r["step_click"], r["step_purchase"]) == (1, 1, 1)
