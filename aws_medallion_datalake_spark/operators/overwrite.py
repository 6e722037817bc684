"""Partition-scoped atomic overwrites: dynamic partition overwrite and
predicate overwrite (REPLACE WHERE).

Reference parity: the daily bronze/silver jobs refresh ONE day of data
by rewriting its ``year=/month=/day=`` prefix in place
(/root/reference/scripts/bronze_digit_daily.py:184-190, SURVEY.md §2.9
T6) — a blind, non-atomic refresh a concurrent reader can observe
half-done. These operators are the snapshot-isolated versions:

- :func:`overwrite_partitions` — Iceberg ``overwritePartitions()`` /
  Spark ``partitionOverwriteMode=dynamic``: atomically replace exactly
  the partition tuples PRESENT IN the incoming frame, leaving every
  other partition untouched. The daily-refresh shape: recompute one
  day, commit, readers flip atomically.
- :func:`replace_where` — Delta ``replaceWhere`` / Iceberg
  ``overwrite(expr)``: atomically delete every row matching a
  predicate and insert the incoming frame, validating (like Delta)
  that the incoming rows all satisfy the predicate.

100 TB shape: both plan entirely from manifest statistics. Dynamic
overwrite resolves the touched tuples with ONE distinct over the
incoming frame's partition-transform values (the incoming refresh is
the small side — a day of a 10^12-row table), drops exactly-matching
files WHOLESALE (zero IO; provable from min==max==value + zero nulls
per partition field), and row-rewrites only range-partitioned boundary
files whose stats straddle a touched value. REPLACE WHERE splits the
stats-pruned candidates the same way ``fast_count`` does: files FULLY
covered by the predicate drop wholesale, boundary files take a
column-pruned probe then a keep-rewrite — the identical plan shape as
``delete_where``, fused with the insert into one commit so readers
never observe the delete without the insert.
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import transforms
from ..sources.tableformat import (
    DEFAULTS_PROP,
    Snapshot,
    Table,
    _pred_to_column,
    prune_manifest,
    read_split_size,
    rel_path_expr,
    statable_cols,
)
from .metascan import _fully_covered_mask
from .timing import PhaseTimer

__all__ = ["overwrite_partitions", "replace_where"]

# Dynamic overwrite plans per touched tuple; a refresh that touches this
# many partitions is a rewrite of the table, not a partition refresh.
_MAX_TOUCHED_TUPLES = 10_000


def _guard_pending(table: Table, what: str) -> None:
    if table.pending_delete_paths() or table.pending_eq_deletes():
        raise ValueError(
            f"table has merge-on-read deletes pending; run apply_deletes() "
            f"before {what} (whole-file replacement would resurrect "
            f"suppressed rows)"
        )


def _conform(df: DataFrame, table: Table) -> DataFrame:
    """Match columns BY NAME against the table schema, cast to the
    declared types (same contract as SQL INSERT)."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(table.metadata().schema_ddl)
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"incoming frame lacks table columns {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def overwrite_partitions(
    table: Table,
    spark: SparkSession,
    df: DataFrame,
    *,
    target_file_size_bytes: int = 128 * 1024 * 1024,
) -> Snapshot:
    """Dynamic partition overwrite: one atomic snapshot that replaces
    exactly the partition tuples present in ``df``.

    Unpartitioned tables degrade to a full replace (Iceberg's
    ``overwritePartitions`` semantics). File-level planning is
    per-tuple against manifest stats; files the stats PROVE homogeneous
    on a touched tuple drop wholesale, stats-straddling boundary files
    (range-partitioned writers produce them) are row-rewritten with the
    touched rows removed — null-safe on the partition value, so a NULL
    partition tuple replaces like any other. ``df``'s own partitioning
    is respected by the write (pre-route with ``repartition`` on the
    partition expressions, or declare ``write.distribution-mode=hash``
    on the table, for partition-homogeneous output files).
    """
    _guard_pending(table, "overwrite_partitions")
    t0 = time.time()
    pt = PhaseTimer()
    meta = table.metadata()
    out = _conform(df, table)
    specs = transforms.parse_spec(meta.partition_cols)

    if not specs or meta.current_snapshot_id is None:
        # unpartitioned (or empty) table: dynamic overwrite IS a replace
        with pt.phase("write"):
            entries = table.write_files(out)
        n_new = int(entries["record_count"].sum()) if len(entries) else 0
        summ = {
            "stage": "overwrite_partitions",
            "rows_inserted": n_new,
            "partitions_replaced": -1,
            "duration_sec": round(time.time() - t0, 3),
            "phase_sec": pt.summary(),
        }
        if len(entries):
            summ["insert_prefix"] = (
                os.path.dirname(str(entries.iloc[0]["path"])) + "/"
            )
        return table.commit("overwrite", entries, summ)

    # persist the conformed frame: the tuple plan and the file write must
    # observe the SAME rows (a non-deterministic source re-executed per
    # action could write a partition the plan never saw)
    out = out.persist()
    with pt.phase("plan"):
        tuples = [
            tuple(r)
            for r in out.select(
                *[t.expr().alias(t.name) for t in specs]
            ).distinct().collect()
        ]
        if len(tuples) > _MAX_TOUCHED_TUPLES:
            out.unpersist()
            raise ValueError(
                f"incoming frame touches {len(tuples)} partition tuples "
                f"(> {_MAX_TOUCHED_TUPLES}); use a full INSERT OVERWRITE "
                f"for table-scale refreshes"
            )
    with pt.phase("write"):
        entries = table.write_files(out)
    out.unpersist()
    n_new = int(entries["record_count"].sum()) if len(entries) else 0

    with pt.phase("plan"):
        man = table.manifest_pdf()
        statable = statable_cols(meta)
        dfl = set(json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}"))))
        drop = pd.Series(False, index=man.index)
        boundary = pd.Series(False, index=man.index)
        for vals in tuples:
            preds = [
                (t.name, "=", v)
                for t, v in zip(specs, vals)
                if v is not None
            ]
            nulls = [t for t, v in zip(specs, vals) if v is None]
            preds += [(t.name, "isnull", None) for t in nulls]
            cand = prune_manifest(man, preds, statable)
            if not len(cand):
                continue
            full = _fully_covered_mask(cand, preds, unsound_cols=dfl)
            drop.loc[cand.index[full]] = True
            boundary.loc[cand.index[~full]] = True
        boundary &= ~drop

    rewritten = man.iloc[0:0]
    n_rewritten_files = int(boundary.sum())
    if n_rewritten_files:
        cond = reduce(
            lambda a, b: a | b,
            (
                reduce(
                    lambda a, b: a & b,
                    (
                        t.expr().eqNullSafe(F.lit(v))
                        for t, v in zip(specs, vals)
                    ),
                )
                for vals in tuples
            ),
        )
        paths = [
            os.path.join(table.root, p) for p in man.loc[boundary, "path"]
        ]
        prefix = table.new_data_prefix()
        with pt.phase("rewrite"), read_split_size(
            spark, target_file_size_bytes
        ):
            keep = table.read_data(spark, paths).filter(
                ~F.coalesce(cond, F.lit(False))
            )
            table.data_writer(keep).parquet(prefix)
        with pt.phase("stats"):
            if any(f.endswith(".parquet") for f in os.listdir(prefix)):
                rewritten = table.collect_stats_for_prefix(spark, prefix)

    removed = man.loc[drop | boundary]
    kept = man.loc[~(drop | boundary)]
    new_man = pd.concat([kept, rewritten, entries], ignore_index=True)
    n_removed = int(removed["record_count"].sum()) - (
        int(rewritten["record_count"].sum()) if len(rewritten) else 0
    )
    summ = {
        "stage": "overwrite_partitions",
        "partitions_replaced": len(tuples),
        "rows_inserted": n_new,
        "rows_deleted": n_removed,
        "files_dropped_wholesale": int(drop.sum()),
        "files_rewritten": n_rewritten_files,
        "duration_sec": round(time.time() - t0, 3),
        "phase_sec": pt.summary(),
    }
    if len(entries):
        # incremental consumers (changes()) emit ONLY these files —
        # boundary keep-rewrites carry pre-existing rows
        summ["insert_prefix"] = (
            os.path.dirname(str(entries.iloc[0]["path"])) + "/"
        )
    return table.commit("overwrite", new_man, summ)


def replace_where(
    table: Table,
    spark: SparkSession,
    df: DataFrame,
    predicates: Iterable[tuple],
    *,
    validate: bool = True,
    target_file_size_bytes: int = 128 * 1024 * 1024,
) -> Snapshot:
    """Atomic predicate overwrite (Delta ``replaceWhere`` / Iceberg
    ``overwrite(expr)``): delete every row matching ALL predicates and
    land ``df`` in the SAME snapshot.

    ``validate=True`` (Delta's default) rejects the commit if any
    incoming row does NOT satisfy the predicate — the guard that keeps
    "replace March" from quietly inserting April rows. Predicates are
    the engine's standard ``(col, op, value)`` triples, so file pruning
    is identical to ``scan``/``delete_where``; fully-covered files drop
    with zero IO.
    """
    _guard_pending(table, "replace_where")
    preds = list(predicates)
    if not preds:
        raise ValueError(
            "replace_where with no predicate is INSERT OVERWRITE; "
            "pass an explicit predicate list"
        )
    t0 = time.time()
    pt = PhaseTimer()
    meta = table.metadata()
    out = _conform(df, table)
    cond = reduce(
        lambda a, b: a & b, (_pred_to_column(c, op, v) for c, op, v in preds)
    )
    if validate:
        with pt.phase("validate"):
            bad = out.filter(~F.coalesce(cond, F.lit(False))).limit(1).count()
        if bad:
            raise ValueError(
                "replace_where validation failed: incoming rows exist "
                "outside the predicate (pass validate=False to land them "
                "anyway, Iceberg overwrite semantics)"
            )

    with pt.phase("write"):
        entries = table.write_files(out)
    n_new = int(entries["record_count"].sum()) if len(entries) else 0

    if meta.current_snapshot_id is None:
        summ = {
            "stage": "replace_where",
            "rows_inserted": n_new,
            "duration_sec": round(time.time() - t0, 3),
            "phase_sec": pt.summary(),
        }
        if len(entries):
            summ["insert_prefix"] = (
                os.path.dirname(str(entries.iloc[0]["path"])) + "/"
            )
        return table.commit("overwrite", entries, summ)

    with pt.phase("plan"):
        man = table.manifest_pdf()
        statable = statable_cols(meta)
        dfl = set(json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}"))))
        cand = prune_manifest(
            man,
            transforms.extend_predicates(meta.partition_cols, preds),
            statable,
        )
        full_mask = (
            _fully_covered_mask(cand, preds, unsound_cols=dfl)
            if len(cand)
            else pd.Series(dtype=bool)
        )
        dropped = cand.loc[full_mask] if len(cand) else cand
        probe_set = cand.loc[~full_mask] if len(cand) else cand

    touched_rel: set = set()
    if len(probe_set):
        with pt.phase("probe"):
            rel = rel_path_expr(table.root)
            touched_rel = set(
                table.read_data(
                    spark,
                    [os.path.join(table.root, p) for p in probe_set["path"]],
                )
                .filter(cond)
                .select(rel.alias("path"))
                .distinct()
                .toPandas()["path"]
            )

    rewritten = man.iloc[0:0]
    if touched_rel:
        prefix = table.new_data_prefix()
        with pt.phase("rewrite"), read_split_size(
            spark, target_file_size_bytes
        ):
            keep = table.read_data(
                spark, [os.path.join(table.root, p) for p in touched_rel]
            ).filter(~F.coalesce(cond, F.lit(False)))
            table.data_writer(keep).parquet(prefix)
        with pt.phase("stats"):
            if any(f.endswith(".parquet") for f in os.listdir(prefix)):
                rewritten = table.collect_stats_for_prefix(spark, prefix)

    removed_paths = set(dropped["path"]) | touched_rel
    kept = man[~man["path"].isin(removed_paths)]
    new_man = pd.concat([kept, rewritten, entries], ignore_index=True)
    removed_records = int(man[man["path"].isin(removed_paths)]["record_count"].sum())
    n_deleted = removed_records - (
        int(rewritten["record_count"].sum()) if len(rewritten) else 0
    )
    summ = {
        "stage": "replace_where",
        "predicates": [[str(c), str(op), str(v)] for c, op, v in preds],
        "rows_inserted": n_new,
        "rows_deleted": n_deleted,
        "files_dropped_wholesale": int(len(dropped)),
        "files_rewritten": len(touched_rel),
        "files_candidate": int(len(cand)),
        "duration_sec": round(time.time() - t0, 3),
        "phase_sec": pt.summary(),
    }
    if len(entries):
        summ["insert_prefix"] = (
            os.path.dirname(str(entries.iloc[0]["path"])) + "/"
        )
    return table.commit("overwrite", new_man, summ)
