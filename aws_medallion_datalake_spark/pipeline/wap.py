"""Write-audit-publish ingestion: stage → quality-gate → publish/reject.

The reference's pipeline trusts every bronze write immediately (the Glue
jobs publish as they go — /root/reference/scripts/bronze_digit.py:143-149);
its quality checks run AFTER the fact as gold metrics
(/root/reference/scripts/gold_agilean.py:103-162). At 100 TB that ordering
is backwards: one bad ingest batch poisons every downstream consumer until
someone notices the metric. WAP inverts it — the batch is committed as a
STAGED snapshot (invisible to readers), an audit job profiles exactly the
staged delta, and only a passing batch is published. Iceberg's
``spark.wap.id`` workflow, built on ``Table.commit(stage_only=True)`` /
``delta_scan`` / ``publish`` / ``drop_staged``.

Scale shape: the gate is one aggregate pass over ONLY the new files
(manifest-planned — prior table data is never rescanned) plus a bounded
decode sample; both are plain Spark jobs that parallelize with the batch.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tableformat import Snapshot, Table
from .medallion import VALID_FMTS

GateResult = Tuple[bool, dict]


def image_audit_gate(
    delta: DataFrame,
    *,
    min_rows: int = 1,
    decode_sample_fraction: float = 0.05,
    max_decode_rows: int = 1024,
) -> GateResult:
    """Audit a staged image delta. Two bounded jobs:

    1. ONE aggregate pass over the delta's metadata columns — row count,
       null keys, empty payloads, fmt whitelist, non-positive dims
       (the silver validation predicates from
       /root/reference/scripts/silver_digit_clean.py:71-118, applied
       BEFORE publish instead of after).
    2. A decode probe over a bounded sample: payloads must actually
       decode and match their (w, h) metadata. Sample size is capped at
       ``max_decode_rows`` so audit cost stays O(1) per batch as the
       batch grows; raise the cap (or fraction to 1.0) for paranoid
       tables.
    """
    from ..functions.udfs import decode_ok_udf

    m = (
        delta.agg(
            F.count("*").alias("rows"),
            F.coalesce(
                F.sum(F.col("image_id").isNull().cast("long")), F.lit(0)
            ).alias("null_keys"),
            F.coalesce(
                F.sum(
                    (F.col("bytes").isNull() | (F.length("bytes") == 0)).cast("long")
                ),
                F.lit(0),
            ).alias("empty_payloads"),
            F.coalesce(
                F.sum((~F.col("fmt").isin(*VALID_FMTS)).cast("long")), F.lit(0)
            ).alias("bad_fmt"),
            F.coalesce(
                F.sum(((F.col("w") <= 0) | (F.col("h") <= 0)).cast("long")),
                F.lit(0),
            ).alias("bad_dims"),
        )
        .collect()[0]
        .asDict()
    )
    n = int(m["rows"])
    m["decode_checked"] = 0
    m["decode_failures"] = 0
    if n > 0:
        frac = decode_sample_fraction
        if n * frac > max_decode_rows:
            frac = max_decode_rows / n
        sample = delta.select("bytes", "w", "h")
        if frac < 1.0:
            sample = sample.sample(fraction=frac, seed=7)
        probe = sample.select(
            decode_ok_udf(F.col("bytes"), F.col("w"), F.col("h")).alias("ok")
        ).agg(
            F.count("*").alias("checked"),
            F.coalesce(F.sum((~F.col("ok")).cast("long")), F.lit(0)).alias("bad"),
        ).collect()[0]
        m["decode_checked"] = int(probe["checked"])
        m["decode_failures"] = int(probe["bad"])
    ok = (
        n >= min_rows
        and int(m["null_keys"]) == 0
        and int(m["empty_payloads"]) == 0
        and int(m["bad_fmt"]) == 0
        and int(m["bad_dims"]) == 0
        and m["decode_failures"] == 0
    )
    return ok, {k: int(v) for k, v in m.items()}


def gated_append(
    table: Table,
    spark: SparkSession,
    df: DataFrame,
    *,
    wap_id: str,
    gate: Callable[[DataFrame], GateResult] = image_audit_gate,
    publish_on_pass: bool = True,
    drop_on_fail: bool = False,
) -> dict:
    """Stage ``df`` as a WAP append, audit exactly the staged delta, and
    publish iff the gate passes. A failing batch stays STAGED (pinned
    from expiry, readable via ``scan(snapshot_id=...)`` for debugging)
    unless ``drop_on_fail`` — then it is dropped from the log and its
    files are left for the orphan sweep."""
    staged = table.commit(
        "append", table.write_files(df), stage_only=True, wap_id=wap_id
    )
    ok, metrics = gate(table.delta_scan(spark, staged.snapshot_id))
    result = {
        "wap_id": wap_id,
        "staged_snapshot_id": staged.snapshot_id,
        "passed": ok,
        "published": False,
        "metrics": metrics,
    }
    if ok and publish_on_pass:
        pub: Snapshot = table.publish(snapshot_id=staged.snapshot_id)
        result["published"] = True
        result["published_snapshot_id"] = pub.snapshot_id
    elif not ok and drop_on_fail:
        table.drop_staged(snapshot_id=staged.snapshot_id)
        result["dropped"] = True
    return result
