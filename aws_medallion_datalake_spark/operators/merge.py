"""MERGE INTO (upsert) with copy-on-write file rewrite and skew handling.

The reference's only write semantic is blind overwrite-refresh
(/root/reference/scripts/silver_digit_clean.py:127, SURVEY.md §2.9 T6);
MERGE is the operation the north_rule adds. Semantics (Iceberg
``MERGE INTO t USING s ON t.image_id = s.image_id WHEN MATCHED THEN UPDATE
SET * WHEN NOT MATCHED THEN INSERT *``):

1. **Find touched files** — join the target scan (key + hidden
   ``_metadata.file_path``) against the distinct source keys; only files
   containing a matched key are rewritten (column-pruned scan: the probe
   reads just ``image_id`` from parquet).
2. **Rewrite without a payload join** — because MATCHED THEN UPDATE SET *
   replaces the whole row, the rewrite is pure set algebra on the KEY:

       keep  = touched-file rows ANTI-JOIN source keys
       delta = source, wholesale

   (`touched` holds EVERY file containing a source key, so
   updates ∪ inserts == source exactly — no insert anti-join needed.)
   The anti-join carries only the key on its small side, so AQE makes it
   a broadcast filter and **no image payload ever shuffles** — the
   keep-side write preserves its input splits (each read task writes its
   already-clustered, already-sized partition straight back out,
   Iceberg-style copy-on-write), and the source lands as modest
   cluster-key-sorted delta files. A naive full-outer join (the obvious
   translation) sort-merges every payload byte; an intermediate version
   re-range-partitioned the union and still paid a full 730 MB exchange
   — this formulation pays zero.
3. **Counts** — rows_updated = |touched keys ∩ source keys| (one
   key-only semi count); rows_inserted = |source| − rows_updated.
4. **Commit** — old manifest minus touched files plus new entries, as one
   ``merge`` snapshot (readers never see a half-merge).

Repeated merges shrink keep-files below target and accrete small delta
files — exactly the debt bin-packing compaction repays; clustering
restores global sort order. This is the same division of labor as
Iceberg's MERGE + RewriteDataFiles.

Skew: the hot-phash tail concentrates matched keys in a few files; with
broadcast key-joins there is no shuffle for skew to poison, and AQE
skew-join splitting (session default) covers the SMJ fallback when the
source is too large to broadcast its keys.

Source key uniqueness is enforced (duplicate source keys make MERGE
non-deterministic — same rule as Iceberg's cardinality check).
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tableformat import Snapshot, Table


def merge_into(
    table: Table,
    spark: SparkSession,
    source: DataFrame,
    *,
    key: str = "image_id",
    target_file_size_bytes: int = 128 * 1024 * 1024,
    n_salt: int = 4,
    check_duplicate_keys: bool = True,
    range_cols: tuple = ("phash",),
) -> Snapshot:
    t0 = time.time()
    meta = table.metadata()
    man = table.manifest_pdf()

    if check_duplicate_keys:
        dup = source.groupBy(key).count().filter("count > 1")
        if not dup.isEmpty():
            raise ValueError(f"MERGE source has duplicate keys on {key!r}")

    src = source.cache()
    src_keys = src.select(key).distinct()

    # 1. touched files: column-pruned probe scan over the manifest file set
    target_all = table.scan(spark)
    probe = target_all.select(
        F.col(key), F.col("_metadata.file_path").alias("__fp")
    ).join(src_keys, key, "inner")
    touched_abs = [r["__fp"] for r in probe.select("__fp").distinct().collect()]
    touched_rel = {os.path.relpath(_strip(p), table.root) for p in touched_abs}

    new_entries_frames = []
    prefixes: list = []
    n_matched = 0
    cols = [f.name for f in table._schema(spark).fields]
    if touched_rel:
        touched_paths = [os.path.join(table.root, p) for p in sorted(touched_rel)]
        tgt = spark.read.schema(table._schema(spark)).parquet(*touched_paths)
        # MATCHED THEN UPDATE SET * == replace whole row → key-only join:
        keep = tgt.join(src_keys, key, "left_anti")
        n_matched = tgt.select(key).join(src_keys, key, "left_semi").count()
        # Shuffle-free copy-on-write (Iceberg-style): the anti-join is a
        # broadcast filter, so `keep` PRESERVES the input splits — each
        # read task writes its (already clustered, already ≈target-sized)
        # partition straight back out.
        prefixes.append(_split_preserving_write(table, keep))

    # Every source row survives MERGE: matched keys replace target rows
    # (their old copies were filtered from the touched files), unmatched
    # keys are inserts — and since `touched` contains EVERY file holding
    # a source key, updates ∪ inserts == source exactly. One wholesale
    # delta write, no insert anti-join job.
    delta_prefix = _modest_write(table, src.select(cols))
    prefixes.append(delta_prefix)

    # one batched stats job over every prefix this merge wrote
    nonempty = [p for p in prefixes if _has_parquet(p)]
    if nonempty:
        entries = table.collect_stats_for_prefix(spark, nonempty)
        new_entries_frames.append(entries)
        n_src = int(
            entries[entries["path"].str.startswith(_rel(table, delta_prefix))][
                "record_count"
            ].sum()
        ) if _has_parquet(delta_prefix) else 0
    else:
        n_src = 0
    n_inserts = n_src - n_matched

    keep_man = man[~man["path"].isin(touched_rel)]
    new_man = (
        pd.concat([keep_man] + new_entries_frames, ignore_index=True)
        if new_entries_frames
        else keep_man
    )
    snap = table.commit(
        "merge",
        new_man,
        {
            "stage": "merge",
            "rows_updated": int(n_matched),
            "rows_inserted": int(n_inserts),
            "files_rewritten": len(touched_rel),
            "duration_sec": round(time.time() - t0, 3),
        },
    )
    src.unpersist()
    return snap


def _split_preserving_write(table, df) -> str:
    """Write df with its CURRENT partitioning (no exchange of any kind).

    Used for the keep-side of copy-on-write: input splits are the old
    clustered files, so outputs inherit their size and sort order.
    Returns the output prefix (stats are batched by the caller)."""
    prefix = table.new_data_prefix()
    df.write.mode("append").parquet(prefix)
    return prefix


def _modest_write(table, df) -> str:
    """Write a small delta (updates/inserts) as a handful of files sorted
    by the cluster key — no shuffle beyond a coalesce."""
    from ..functions.udfs import morton64_expr

    n_out = max(1, df.sparkSession.sparkContext.defaultParallelism // 8)
    out = (
        df.coalesce(n_out)
        .sortWithinPartitions(
            *[c for c in ("ingest_date",) if c in df.columns],
            morton64_expr(F.col("phash"), F.col("w"), F.col("h")),
        )
    )
    prefix = table.new_data_prefix()
    out.write.mode("append").parquet(prefix)
    return prefix


def _has_parquet(prefix: str) -> bool:
    return any(f.endswith(".parquet") for f in os.listdir(prefix))


def _rel(table, prefix: str) -> str:
    return os.path.relpath(prefix, table.root)


def _strip(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p
