"""Bin-packing small-file compaction with concurrent group rewrites.

The scale path the reference lacks: its writers ``coalesce(1)`` every run
(/root/reference/scripts/silver_digit_clean.py:127 — SURVEY.md §4
"small-file management"), accumulating one small file per partition per day
forever. Here a planner packs manifest entries into ≈target-size rewrite
groups (plans/binpack.py) and each group is rewritten by its own small Spark
job; groups run concurrently from a driver thread pool — the same
architecture as Iceberg's RewriteDataFiles action, and the part that keeps
1000 executors busy when compacting a 10^12-row table: group jobs are
independent, so parallelism scales with the number of groups, not with any
single shuffle.

Resumability (north_rule): each finished group appends a ``unit_done``
lineage record (source snapshot, input files, rows/bytes, output prefix +
stats) to the RunCheckpoint. A killed run restarted with the same
checkpoint rewrites only the remaining groups and commits the identical
snapshot content.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import pandas as pd
from pyspark.sql import SparkSession

from ..plans.binpack import CompactionGroup, CompactionPlan, plan_compaction
from ..sources.tableformat import Snapshot, Table
from .checkpoint import RunCheckpoint

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _sort_key(df):
    """Cluster sort key when the image columns exist, else None — keeps
    compaction generic over non-image tables."""
    from pyspark.sql import functions as F

    from ..functions.udfs import morton64_expr

    if {"phash", "w", "h"} <= set(df.columns):
        return morton64_expr(F.col("phash"), F.col("w"), F.col("h"))
    return None


def _rewrite_group(
    table: Table, spark: SparkSession, group: CompactionGroup
) -> str:
    """Read one group's files, write n_output_files right-sized outputs.

    Sort order is preserved, not destroyed: pack groups (N small files →
    1) concatenate key-adjacent inputs with ``coalesce(1)`` (no
    exchange) and re-sort the single output partition in memory; split
    groups (1 oversized file → N) use ``repartitionByRange`` on the
    cluster key — its sampling pass reads only this group's file — so
    post-compaction files keep disjoint key ranges and manifest pruning
    quality survives until the next cluster run.

    Returns the output prefix; per-file stats are collected for ALL
    groups in one batched Spark job afterwards (a per-group
    ``toPandas`` would serialize ~N driver round-trips through the GIL
    — the 4N-thread profile showed exactly that hotspot)."""
    import os

    from pyspark.sql import functions as F

    paths = [os.path.join(table.root, p) for p in group.paths]
    df = spark.read.schema(table._schema(spark)).parquet(*paths)
    key = _sort_key(df)
    part_cols = [F.col(c) for c in table.metadata().partition_cols]
    sort_cols = part_cols + ([key] if key is not None else [])
    if group.n_output_files == 1:
        df = df.coalesce(1)
        if sort_cols and group.ordered:
            # re-sort only range-structured inputs (clustered layout);
            # sorting random bronze buys no pruning and costs CPU
            df = df.sortWithinPartitions(*sort_cols)
    elif key is not None:
        df = df.repartitionByRange(group.n_output_files, *sort_cols)
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(group.n_output_files)  # round-robin: even sizes
    prefix = table.new_data_prefix()
    df.write.mode("append").parquet(prefix)
    return prefix


def compact(
    table: Table,
    spark: SparkSession,
    *,
    target_file_size_bytes: int = DEFAULT_TARGET_BYTES,
    min_input_files: int = 2,
    parallelism: int = 8,
    checkpoint: Optional[RunCheckpoint] = None,
) -> Optional[Snapshot]:
    """Compact the current snapshot; returns the new snapshot or None if
    nothing to do. Safe to re-run; resumable via ``checkpoint``."""
    t0 = time.time()
    src_snapshot = table.metadata().current_snapshot_id
    man = table.manifest_pdf()
    plan: CompactionPlan = plan_compaction(
        man, target_file_size_bytes, min_input_files=min_input_files
    )
    if not plan.groups:
        return None

    results: dict = {}

    def run_group(g: CompactionGroup):
        unit = f"group-{g.group_id}"
        if checkpoint is not None and checkpoint.is_unit_done("compact", unit):
            results[g.group_id] = checkpoint.unit_payload("compact", unit)["output_prefix"]
            return
        prefix = _rewrite_group(table, spark, g)
        if checkpoint is not None:
            checkpoint.unit_done(
                "compact",
                unit,
                {
                    "source_snapshot_id": src_snapshot,
                    "partition": g.partition_json,
                    "input_files": list(g.paths),
                    "input_records": g.input_records,
                    "input_bytes": g.input_bytes,
                    "output_prefix": prefix,
                },
            )
        results[g.group_id] = prefix

    # Concurrent group jobs keep many executors busy on a real cluster
    # (Iceberg's RewriteDataFiles ships 5 by default); more driver threads
    # than ~8 just contend on the GIL/py4j in local mode.
    with ThreadPoolExecutor(max_workers=min(parallelism, 8)) as pool:
        futures = [pool.submit(run_group, g) for g in plan.groups]
        for f in futures:
            f.result()  # surface the first failure

    rewritten = plan.rewritten_paths
    keep = man[~man["path"].isin(rewritten)]
    prefixes = [results[g.group_id] for g in plan.groups]
    new_entries = table.collect_stats_for_prefix(spark, prefixes)  # one job
    new_man = pd.concat([keep, new_entries], ignore_index=True)
    snap = table.commit(
        "replace",
        new_man,
        {
            "stage": "compact",
            **plan.summary(),
            "rewritten_files": len(rewritten),
            "duration_sec": round(time.time() - t0, 3),
        },
    )
    if checkpoint is not None:
        checkpoint.stage_done("compact", dict(snap.summary, snapshot_id=snap.snapshot_id))
    return snap
