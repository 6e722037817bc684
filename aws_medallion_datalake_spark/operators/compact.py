"""Bin-packing small-file compaction with batched concurrent rewrites.

The scale path the reference lacks: its writers ``coalesce(1)`` every run
(/root/reference/scripts/silver_digit_clean.py:127 — SURVEY.md §4
"small-file management"), accumulating one small file per partition per day
forever. A planner packs manifest entries into ≈target-size rewrite groups
(plans/binpack.py); groups are then rewritten in BATCHES: one Spark job
routes up to ``groups_per_job`` groups' rows (broadcast path→salt join +
one exact shuffle, plan size O(1) in the batch width) into one output
file per group — a 10^6-small-file backlog costs hundreds of jobs, not a
job per file pack. When the backlog exceeds one batch, batches run
concurrently from a driver thread pool — the same architecture as
Iceberg's RewriteDataFiles action: batch jobs are independent, so
parallelism scales with batch count × groups-per-batch, not with any
single shuffle. (Within one batch the exact shuffle already spreads
across the cluster; the pool only matters for multi-batch backlogs.)

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

from ..plans.binpack import (
    CompactionGroup,
    CompactionPlan,
    plan_compaction,
    plan_compaction_spark,
)
from ..sources import transforms
from ..sources.tableformat import Snapshot, Table, statable_cols
from .checkpoint import RunCheckpoint
from .timing import PhaseTimer

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024
# Same per-job width bound as cluster tiles: the routing table is data
# (not plan literals), so a batch can carry thousands of groups; the cap
# bounds the broadcast row count and the shuffle width of one job.
DEFAULT_GROUPS_PER_JOB = 4096


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
    df = table.read_data(spark, paths)
    key = _sort_key(df)
    part_cols = transforms.exprs(table.metadata().partition_cols)
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
    their source file: a (path → routing salt) TABLE is broadcast and
    hash-joined against ``_metadata.file_path``, then one exact shuffle
    lands one partition — and one output file — per group. The routing
    table is DATA, not plan literals (an earlier version in-lined a
    ``create_map`` with one literal pair per file, which grows the plan
    O(files-per-batch) and forced small batches — the same plan-size
    failure mode the cluster router had); the plan is O(1) in the batch
    size, so one job per ordered-class can carry thousands of groups and
    the per-job driver fixed cost is amortized across ALL of them.
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
        table.data_writer(df).parquet(prefix)
        return prefix

    from .cluster import exact_route_salts

    n = len(groups)
    salts = exact_route_salts(n)
    route_rows = [
        (p, int(salts[i])) for i, g in enumerate(groups) for p in g.paths
    ]
    route_df = spark.createDataFrame(route_rows, "__route_path string, __rt int")
    paths = [os.path.join(table.root, p) for g in groups for p in g.paths]
    df = (
        table.read_data(spark, paths)
        .withColumn("__route_path", rel_path_expr(table.root))
        .join(F.broadcast(route_df), "__route_path", "inner")
        .drop("__route_path")
    )
    df = df.repartition(n, F.col("__rt")).drop("__rt")
    key = _sort_key(df)
    part_cols = transforms.exprs(table.metadata().partition_cols)
    sort_cols = part_cols + ([key] if key is not None else [])
    if sort_cols and groups[0].ordered:
        df = df.sortWithinPartitions(*sort_cols)
    prefix = table.new_data_prefix()
    table.data_writer(df).parquet(prefix)
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
    predicates: Optional[list] = None,
) -> Optional[Snapshot]:
    """Compact the current snapshot; returns the new snapshot or None if
    nothing to do. Safe to re-run; resumable via ``checkpoint``.

    ``predicates``: scope the rewrite to files whose stats intersect the
    scan-style ``(col, op, value)`` predicates (Iceberg
    ``rewrite_data_files(where=…)``). Whole files are selected, never
    row-filtered, so out-of-scope files are carried through untouched —
    at 10^12-row scale maintenance targets the hot partitions of the
    day's ingest, not the whole table. Hidden-partition transforms apply
    (a plain ``ingest_date`` predicate scopes a ``days(ingest_date)``
    table)."""
    if table.pending_delete_paths() or table.pending_eq_deletes():
        # a pack-group rewrite copies whole files, resurrecting rows a
        # pending positional/equality delete suppresses (and re-stamping a
        # file's path would break the equality sequence rule) —
        # materialize them first
        raise ValueError(
            "table has merge-on-read deletes pending; run apply_deletes() "
            "before compaction"
        )
    t0 = time.time()
    pt = PhaseTimer()
    with pt.phase("plan"):
        from ..sources import transforms
        from ..sources.tableformat import (
            SPARK_MANIFEST_THRESHOLD,
            manifest_prune_cond,
            prune_manifest,
        )

        meta = table.metadata()
        src_snapshot = meta.current_snapshot_id
        prune_preds = (
            transforms.extend_predicates(meta.partition_cols, list(predicates))
            if predicates
            else []
        )
        statable = statable_cols(meta)
        n_entries = table.manifest_rows()
        if n_entries > SPARK_MANIFEST_THRESHOLD:
            # distributed planning: the FFD loop runs per-partition on
            # executors; the driver gets one row per GROUP, not per file.
            # Predicate scoping filters the manifest RELATION — surviving
            # paths never land on the driver.
            man_df = table.manifest_df(spark)
            if prune_preds:
                man_df = man_df.filter(
                    manifest_prune_cond(set(man_df.columns), prune_preds, statable)
                )
            plan: CompactionPlan = plan_compaction_spark(
                man_df,
                target_file_size_bytes,
                min_input_files=min_input_files,
            )
        else:
            man_scope = table.manifest_pdf()
            if prune_preds:
                man_scope = prune_manifest(man_scope, prune_preds, statable)
            plan = plan_compaction(
                man_scope,
                target_file_size_bytes,
                min_input_files=min_input_files,
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
    stats_frames: dict = {}

    def stats_for(bno: int, prefix: str) -> None:
        # per-batch stats collected INSIDE the batch's own thread as its
        # write lands (or its checkpoint resume resolves): batch A's
        # stats job overlaps batch B's write instead of forming a serial
        # post-barrier tail (measured 3-6 s on the bench).
        with pt.phase("stats"):
            stats_frames[bno] = table.collect_stats_for_prefix(spark, prefix)

    def run_batch(bno: int, groups: list):
        unit = f"batch-{bno}"
        if checkpoint is not None and checkpoint.is_unit_done("compact", unit):
            results[bno] = checkpoint.unit_payload("compact", unit)["output_prefix"]
            stats_for(bno, results[bno])
            return
        with pt.phase("rewrite"):
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
        stats_for(bno, prefix)

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
    # the commit manifest is pandas either way; load it once, here
    man = table.manifest_pdf()
    keep = man[~man["path"].isin(rewritten)]
    new_entries = pd.concat(
        [stats_frames[i] for i in range(len(batches))], ignore_index=True
    )
    new_man = pd.concat([keep, new_entries], ignore_index=True)
    # residual of duration_sec minus the phases = commit/manifest IO
    snap = table.commit(
        "replace",
        new_man,
        {
            "stage": "compact",
            **plan.summary(),
            "batches": len(batches),
            "rewritten_files": len(rewritten),
            "duration_sec": round(time.time() - t0, 3),
            "phase_sec": pt.summary(),
        },
    )
    if checkpoint is not None:
        checkpoint.stage_done("compact", dict(snap.summary, snapshot_id=snap.snapshot_id))
    return snap
