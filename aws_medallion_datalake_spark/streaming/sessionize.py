"""Event sessionization — custom stateful streaming operator + batch twin.

The reference has no streaming at all (its "incremental" is daily
batch-with-watermark, SURVEY.md §2.9); this module supplies the
Spark-native stateful pattern the engine brief calls for
(``applyInPandasWithState`` for custom stateful operators) applied to the
classic operator Spark lacks natively: gap-based sessionization — group a
key's events into sessions separated by more than ``gap``.

Two implementations with IDENTICAL session semantics, tested against each
other (tests/test_streaming.py):

- :func:`sessionize_batch` — pure DataFrame/window algebra
  (lag → gap flag → cumulative sum = session id → groupBy). Fully
  SQL-expressible, DuckDB-oracle-checked via the ``event_sessions``
  entry; this is the 100 TB batch path (one window + one agg shuffle,
  both on the same ``user_id`` key — AQE-coalesced, skew-safe because a
  single user's events fit one partition).
- :func:`sessionize_stream` — ``applyInPandasWithState`` with event-time
  timeout: state per key = the one OPEN session (constant size —
  start/last/count/sum, no event buffering); a batch's events are merged
  vectorized (numpy diff → session boundaries); sessions close either
  when a later event arrives past the gap (emitted immediately) or when
  the watermark passes ``last_ts + gap`` (idle-key timeout). Late rows
  beyond the watermark are dropped by the upstream ``withWatermark``.

At 10^12-event scale the stream path shuffles each micro-batch once on
``user_id`` and holds O(active keys) fixed-width state rows in the state
store — no per-event state growth.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OUTPUT_DDL = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
# epoch-seconds doubles: fixed-width state, no event buffering
STATE_DDL = "session_start double, last_ts double, n_events int, total_value double"


def sessionize_batch(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: lag → new-session flag → cumsum session id →
    one aggregate. Returns one row per session (ALL sessions — batch has
    a complete view, so nothing stays open)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    # epoch with sub-second fraction (matches DuckDB's epoch(ts)) so gap
    # decisions agree with any SQL oracle to the microsecond; the
    # intermediate timestamp cast accepts TIMESTAMP_NTZ sources (parquet
    # naive timestamps), and any session-tz offset cancels in the diff
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    new_sess = (epoch - F.lag(epoch).over(w) > gap_s).cast("int")
    with_id = events.withColumn(
        "__sess", F.sum(F.coalesce(new_sess, F.lit(0))).over(w)
    )
    return (
        with_id.groupBy(F.col(key_col).alias("user_id"), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 6).alias(
                "total_value"
            ),
        )
        .drop("__sess")
    )


def _make_session_fn(gap_sec: int, ts_col: str):
    gap_ms = gap_sec * 1000

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        kid = int(key[0])
        closed: list = []
        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: close
            if state.exists:
                s0, last, n, v = state.get
                closed.append((kid, s0, last, n, v))
            state.remove()
        else:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            tsv = (pdf[ts_col].astype("int64") // 10**9).to_numpy()
            vals = pdf["value"].fillna(0.0).to_numpy()
            # vectorized boundary detection: a gap between consecutive
            # events splits sessions
            bounds = np.flatnonzero(np.diff(tsv) > gap_sec)
            starts = np.concatenate(([0], bounds + 1))
            ends = np.concatenate((bounds, [len(tsv) - 1]))
            segs = [
                (
                    float(tsv[a]),
                    float(tsv[b]),
                    int(b - a + 1),
                    float(vals[a : b + 1].sum()),
                )
                for a, b in zip(starts, ends)
            ]
            if state.exists:
                s0, last, n, v = state.get
                if tsv[0] - last <= gap_sec:
                    # first new segment continues the open session
                    a0, b0, c0, v0 = segs[0]
                    segs[0] = (s0, b0, n + c0, v + v0)
                else:
                    closed.append((kid, s0, last, n, v))
            # every segment but the last is provably closed (a later
            # event exists past its gap) — emit immediately, don't wait
            # for the watermark
            for s0, s1, n, v in segs[:-1]:
                closed.append((kid, s0, s1, n, v))
            s0, s1, n, v = segs[-1]
            state.update((s0, s1, n, v))
            # close the surviving open session when event time moves past
            # its gap (must be set beyond the current watermark)
            state.setTimeoutTimestamp(
                max(int(s1 * 1000) + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            out["total_value"] = out["total_value"].round(6)
        else:
            out = out.astype(
                {
                    "user_id": "int64",
                    "session_start": "datetime64[ns]",
                    "session_end": "datetime64[ns]",
                    "n_events": "int32",
                    "total_value": "float64",
                }
            )
        yield out

    return fn


def sessionize_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization over a streaming DataFrame. Emits one row
    per CLOSED session (append mode); the open session per key lives in
    fixed-width state until a gap or an event-time timeout closes it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_sec = gap_minutes * 60
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _make_session_fn(gap_sec, ts_col),
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
