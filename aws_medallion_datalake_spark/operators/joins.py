"""As-of and range (interval) joins as compositions of DataFrame ops.

Spark has no native ASOF JOIN or interval join; both are staples of a
training-data / event-analytics pipeline (attribution, sensor alignment,
point-in-interval enrichment). Beyond the reference's equi-join surface
(SURVEY §2.3 J1–J5): the reference's Athena layer is equi-join only
(/root/reference/sql/athena_gold_queries.sql). Both operators here are
pure Catalyst compositions — no Python row path, no driver loop.

**asof_join** — the classic scalable shape (one shuffle, linear scan):
tag both sides, UNION them, and run a running ``last(payload,
ignorenulls)`` window partitioned by key and ordered by (time, tag,
payload). Right rows sort before left rows at equal time (backward
as-of includes exact matches), and among equal-time right rows the
payload struct's ascending sort makes the carried match deterministic
(greatest payload wins). Cost at 10^12 rows: ONE hash shuffle of
|left| + |right| rows on the join key plus a per-partition sort — the
same price as the equi-join Spark would plan, with no O(n·m)
inequality-join blowup and no per-key driver work. A pathologically hot
key serializes its running scan inside one task (running windows cannot
be salted without breaking the carry); the mitigation at scale is
time-bucket chunking: split the window into coarse time buckets and
carry each bucket's closing state into the next — the structure
``streaming/sessionize.py`` uses for the stateful variant.

**range_join** — point-in-interval join via bucketization (the
published equi-join reduction used by Spark's own range-join hints and
by the IEJoin literature): quantize the time/number line into
fixed-width buckets; each interval EXPLODES to the buckets it covers,
each point maps to exactly one bucket, the pair equi-joins on (bucket
[+ optional keys]) and the exact predicate filters the candidates.
Picking ``bucket_width`` ≈ the typical interval length bounds the
explode factor at ~2× and confines every comparison to its bucket —
the shuffle key that keeps the join linear at 100 TB instead of the
O(n·m) cross product a naive inequality join plans. Hot buckets (a
burst of intervals over one week) are ordinary equi-join skew: AQE
skew-join splitting applies, unlike the naive plan.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    tolerance: Optional[Column] = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the right row with the greatest ``right_time`` <= ``left_time`` for
    the same ``on`` key (NULLs when no right row precedes — LEFT ASOF
    semantics). Ties on ``right_time`` resolve to the greatest payload
    struct (deterministic across engines). ``tolerance`` (a Column in
    the time column's comparison domain) optionally voids matches older
    than ``left_time - tolerance``.

    Output: every left column, plus ``payload_cols`` from the right
    (same names — rename right columns that collide with left ones
    before the call). See module docstring for the plan shape.
    """
    pay = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col(right_time).alias("__asof_t"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        pay.alias("__pay"),
    )
    left_cols = list(left.columns)
    left_struct_t = StructType(left.schema.fields)
    r = r.withColumn("__row", F.lit(None).cast(left_struct_t))
    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        F.struct(*left_cols).alias("__row"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", "__pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__m",
            F.when(
                F.col("__m.__asof_t") >= F.col("__t") - tolerance, F.col("__m")
            ),
        )
    return carried.select(
        *[F.col(f"__row.{c}").alias(c) for c in left_cols],
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join (``start <= point < end``), reduced to an
    equi-join on quantized buckets (+ optional equi ``keys``). Returns
    the joined rows (all interval columns, then the point columns not
    named in ``keys``); callers aggregate on top. ``bucket_width`` is in
    the value columns' numeric domain — timestamps compare on epoch
    seconds, so a 7-day bucket is ``7 * 86400``. See module docstring
    for why this is the 100 TB-safe plan.
    """

    def numeric(df: DataFrame, col: str) -> Column:
        if dict(df.dtypes)[col].startswith("timestamp"):
            return F.unix_timestamp(F.col(col)).cast("double")
        return F.col(col).cast("double")

    width = F.lit(float(bucket_width))
    pts = points.withColumn("__pn", numeric(points, point_col)).withColumn(
        "__bucket", F.floor(F.col("__pn") / width)
    )
    ivs = (
        intervals.withColumn("__sn", numeric(intervals, start_col))
        .withColumn("__en", numeric(intervals, end_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__sn") / width),
                    F.floor(F.col("__en") / width),
                )
            ),
        )
    )
    cond = [ivs["__bucket"] == pts["__bucket"]] + [
        ivs[k] == pts[k] for k in keys
    ]
    joined = ivs.join(pts, cond, "inner").filter(
        (pts["__pn"] >= ivs["__sn"]) & (pts["__pn"] < ivs["__en"])
    )
    out_cols = [ivs[c] for c in intervals.columns] + [
        pts[c] for c in points.columns if c not in keys
    ]
    return joined.select(*out_cols)
