"""DELETE FROM ... WHERE (predicate copy-on-write).

Rounds out the write family next to MERGE INTO: the reference's only
row-removal story is a full overwrite-refresh of the layer
(/root/reference/scripts/silver_digit_clean.py:127 — SURVEY.md §2.9 T6);
this is the Iceberg ``DELETE FROM t WHERE p`` copy-on-write semantics.

Plan (everything is file-pruned BEFORE any payload IO):

1. **Candidates** — prune the manifest with the predicate against
   per-file min/max stats: only files whose range overlaps the predicate
   can hold a matching row. A delete keyed on the cluster column after a
   cluster run touches a handful of files out of 10^8.
2. **Probe** — a column-pruned scan of the candidates (predicate columns
   + ``_metadata.file_path`` only) finds the files that ACTUALLY contain
   matches; stats-overlap false positives drop out here and are never
   rewritten.
3. **Rewrite** — read the touched files, keep rows for which the
   predicate is NOT true (SQL tri-state: NULL predicate rows survive a
   DELETE), write each read split straight back out — split size is
   aligned with the target file size, so the keep path preserves
   clustering and sizing with zero shuffle, exactly like MERGE's keep
   path.
4. **Commit** — manifest minus touched files plus rewritten entries as
   one ``delete`` snapshot; readers never observe a half-delete, and
   time travel still reads the pre-delete snapshot.

Predicates use the same ``(col, op, value)`` triples as ``Table.scan``
so the pruning logic is shared, not reimplemented.
"""

from __future__ import annotations

import os
import time
from functools import reduce
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.tableformat import (
    Snapshot,
    Table,
    _pred_to_column,
    prune_manifest,
    read_split_size,
    rel_path_expr,
)
from .timing import PhaseTimer


def delete_where(
    table: Table,
    spark: SparkSession,
    predicates: Iterable[tuple],
    *,
    target_file_size_bytes: int = 128 * 1024 * 1024,
) -> Optional[Snapshot]:
    """Delete rows matching ALL predicates; returns the new snapshot, or
    None when no file holds a matching row (no-op, no commit)."""
    t0 = time.time()
    pt = PhaseTimer()
    preds = list(predicates)
    if not preds:
        raise ValueError("delete_where with no predicate would truncate the "
                         "table; pass an explicit predicate list")
    meta = table.metadata()
    man = table.manifest_pdf()

    with pt.phase("plan"):
        statable = list(meta.partition_cols) + list(meta.stats_cols)
        cand = prune_manifest(man, preds, statable)
    if not len(cand):
        return None

    cond = reduce(
        lambda a, b: a & b, (_pred_to_column(c, op, v) for c, op, v in preds)
    )
    schema = table._schema(spark)
    cand_paths = [os.path.join(table.root, p) for p in cand["path"]]
    rel = rel_path_expr(table.root)

    with pt.phase("probe"):
        touched_pdf = (
            spark.read.schema(schema)
            .parquet(*cand_paths)
            .filter(cond)
            .select(rel.alias("path"))
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_matched_rows"))
            .toPandas()
        )
    touched_rel = set(touched_pdf["path"])
    if not touched_rel:
        return None
    touched_man = man[man["path"].isin(touched_rel)]

    prefix = table.new_data_prefix()
    with pt.phase("rewrite"), read_split_size(spark, target_file_size_bytes):
        tgt = spark.read.schema(schema).parquet(
            *[os.path.join(table.root, p) for p in touched_rel]
        )
        # keep rows where the predicate is NOT TRUE (false OR null) —
        # plain ~cond drops predicate-NULL rows, which DELETE must keep
        keep = tgt.filter(~F.coalesce(cond, F.lit(False)))
        keep.write.mode("append").parquet(prefix)

    with pt.phase("stats"):
        new_entries = (
            table.collect_stats_for_prefix(spark, prefix)
            if any(f.endswith(".parquet") for f in os.listdir(prefix))
            else man.iloc[0:0]
        )
    keep_man = man[~man["path"].isin(touched_rel)]
    new_man = pd.concat([keep_man, new_entries], ignore_index=True)

    touched_records = int(touched_man["record_count"].sum())
    kept_records = int(new_entries["record_count"].sum()) if len(new_entries) else 0
    return table.commit(
        "delete",
        new_man,
        {
            "stage": "delete",
            "predicates": [[str(c), str(op), str(v)] for c, op, v in preds],
            "rows_deleted": touched_records - kept_records,
            "files_rewritten": len(touched_rel),
            "files_candidate": int(len(cand)),
            "duration_sec": round(time.time() - t0, 3),
            "phase_sec": pt.summary(),
        },
    )
