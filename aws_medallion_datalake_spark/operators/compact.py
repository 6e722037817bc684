"""Bin-packing small-file compaction with batched concurrent rewrites.

The scale path the reference lacks: its writers ``coalesce(1)`` every run
(/root/reference/scripts/silver_digit_clean.py:127 — SURVEY.md §4
"small-file management"), accumulating one small file per partition per day
forever. A planner packs manifest entries into ≈target-size rewrite groups
(plans/binpack.py); groups are then rewritten in BATCHES: one Spark job
unions up to ``groups_per_job`` single-partition group plans (each group =
read its files → ``coalesce(1)`` → optional in-partition sort), so one
write action emits one output file per group with NO exchange — a
10^6-small-file backlog costs thousands of jobs, not a job per file pack.
Batches run concurrently from a driver thread pool — the same architecture
as Iceberg's RewriteDataFiles action, and the part that keeps 1000
executors busy when compacting a 10^12-row table: batch jobs are
independent, so parallelism scales with batch count × groups-per-batch,
not with any single shuffle.

Resumability (north_rule): each finished batch appends a ``unit_done``
lineage record (source snapshot, groups, input files, rows/bytes, output
prefix) to the RunCheckpoint. A killed run restarted with the same
checkpoint rewrites only the remaining batches and commits the identical
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
DEFAULT_GROUPS_PER_JOB = 32


def _sort_key(df):
    """Cluster sort key when the image columns exist, else None — keeps
    compaction generic over non-image tables."""
    from pyspark.sql import functions as F

    from ..functions.udfs import morton64_expr

    if {"phash", "w", "h"} <= set(df.columns):
        return morton64_expr(F.col("phash"), F.col("w"), F.col("h"))
    return None


def _group_plan(table: Table, spark: SparkSession, group: CompactionGroup):
    """One group's lazy rewrite plan.

    Sort order is preserved, not destroyed: pack groups (N small files →
    1) concatenate key-adjacent inputs with ``coalesce(1)`` (no
    exchange) and, when the inputs are range-structured, re-sort the
    single output partition in memory; split groups (1 oversized file →
    N) use ``repartitionByRange`` on the cluster key — its sampling pass
    reads only this group's file — so post-compaction files keep
    disjoint key ranges and manifest pruning quality survives until the
    next cluster run. (Sorting random bronze input is skipped: it buys
    no pruning and costs CPU.)"""
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
            df = df.sortWithinPartitions(*sort_cols)
    elif key is not None:
        df = df.repartitionByRange(group.n_output_files, *sort_cols)
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(group.n_output_files)  # round-robin: even sizes
    return df


def _rewrite_batch(
    table: Table, spark: SparkSession, groups: list
) -> str:
    """Rewrite a batch of PACK groups as ONE Spark job.

    Each input file belongs to exactly one group, so rows are routed by
    their source file (``_metadata.file_path`` → group routing salt via a
    small literal map) through one exact shuffle into one partition —
    and one output file — per group. Per-job driver overhead is amortized
    over ``groups_per_job`` groups instead of paid per tiny group; the
    shuffled bytes are exactly the small files being packed, which is
    the regime (many tiny groups) where job overhead dominates IO.
    Groups are batched with like ``ordered`` flags: ordered batches
    re-sort each packed partition, unordered (raw bronze) skip the sort.

    (A union of per-group ``coalesce(1)`` plans does NOT work: Spark
    collapses the union of coalesced children into a single partition.)

    Returns the output prefix; per-file stats are collected for ALL
    batches in one batched Spark job afterwards."""
    import os

    from pyspark.sql import functions as F

    from ..sources.tableformat import rel_path_expr

    if len(groups) == 1:
        df = _group_plan(table, spark, groups[0])
        prefix = table.new_data_prefix()
        df.write.mode("append").parquet(prefix)
        return prefix

    from .cluster import exact_route_salts

    n = len(groups)
    salts = exact_route_salts(n)
    kv = []
    for i, g in enumerate(groups):
        for p in g.paths:
            kv += [F.lit(p), F.lit(int(salts[i]))]
    paths = [os.path.join(table.root, p) for g in groups for p in g.paths]
    df = spark.read.schema(table._schema(spark)).parquet(*paths)
    route = F.element_at(F.create_map(*kv), rel_path_expr(table.root))
    df = df.withColumn("__rt", route).repartition(n, F.col("__rt")).drop("__rt")
    key = _sort_key(df)
    part_cols = [F.col(c) for c in table.metadata().partition_cols]
    sort_cols = part_cols + ([key] if key is not None else [])
    if sort_cols and groups[0].ordered:
        df = df.sortWithinPartitions(*sort_cols)
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
    groups_per_job: int = DEFAULT_GROUPS_PER_JOB,
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

    # batchable = single-output pack groups, batched with like `ordered`
    # flags; split groups (and any multi-output group) run individually
    packs_ordered = [g for g in plan.groups if g.n_output_files == 1 and g.ordered]
    packs_plain = [g for g in plan.groups if g.n_output_files == 1 and not g.ordered]
    singles = [g for g in plan.groups if g.n_output_files != 1]
    k = max(1, groups_per_job)
    batches: list = []
    for pool_groups in (packs_ordered, packs_plain):
        batches += [pool_groups[i : i + k] for i in range(0, len(pool_groups), k)]
    batches += [[g] for g in singles]
    results: dict = {}

    def run_batch(bno: int, groups: list):
        unit = f"batch-{bno}"
        if checkpoint is not None and checkpoint.is_unit_done("compact", unit):
            results[bno] = checkpoint.unit_payload("compact", unit)["output_prefix"]
            return
        prefix = _rewrite_batch(table, spark, groups)
        if checkpoint is not None:
            checkpoint.unit_done(
                "compact",
                unit,
                {
                    "source_snapshot_id": src_snapshot,
                    "groups": [g.group_id for g in groups],
                    "partitions": sorted({g.partition_json for g in groups}),
                    "input_files": [p for g in groups for p in g.paths],
                    "input_records": sum(g.input_records for g in groups),
                    "input_bytes": sum(g.input_bytes for g in groups),
                    "output_prefix": prefix,
                },
            )
        results[bno] = prefix

    # Concurrent batch jobs keep many executors busy on a real cluster
    # (Iceberg's RewriteDataFiles ships 5 by default); more driver threads
    # than ~8 just contend on the GIL/py4j in local mode.
    if len(batches) == 1:
        run_batch(0, batches[0])
    else:
        with ThreadPoolExecutor(max_workers=min(parallelism, 8)) as pool:
            futures = [pool.submit(run_batch, i, b) for i, b in enumerate(batches)]
            for f in futures:
                f.result()  # surface the first failure

    rewritten = plan.rewritten_paths
    keep = man[~man["path"].isin(rewritten)]
    prefixes = [results[i] for i in range(len(batches))]
    new_entries = table.collect_stats_for_prefix(spark, prefixes)  # one job
    new_man = pd.concat([keep, new_entries], ignore_index=True)
    snap = table.commit(
        "replace",
        new_man,
        {
            "stage": "compact",
            **plan.summary(),
            "batches": len(batches),
            "rewritten_files": len(rewritten),
            "duration_sec": round(time.time() - t0, 3),
        },
    )
    if checkpoint is not None:
        checkpoint.stage_done("compact", dict(snap.summary, snapshot_id=snap.snapshot_id))
    return snap
