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
2. **Rewrite** — rows of touched files left-join the source; matched rows
   take every source column; untouched rows pass through byte-identical.
3. **Insert** — source anti-join matched keys.
4. **Commit** — old manifest minus touched files plus new entries, as one
   ``merge`` snapshot (readers never see a half-merge).

Skew: the hot-phash tail means a few files hold many matched keys, so the
rewrite output is range-partitioned on (partition cols, phash, salt) — the
salt column splits the hot buckets that a plain range partitioner would
pile into one task. The probe/main joins run under AQE with skew-join
splitting enabled (session default); the source side is auto-broadcast by
AQE when small.

Source key uniqueness is enforced (duplicate source keys make MERGE
non-deterministic — same rule as Iceberg's cardinality check).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tableformat import Snapshot, Table

_SALT = "__merge_salt"


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

    from pyspark.storagelevel import StorageLevel

    new_entries_frames = []
    n_matched = 0
    if touched_rel:
        touched_paths = [os.path.join(table.root, p) for p in sorted(touched_rel)]
        tgt = spark.read.schema(table._schema(spark)).parquet(*touched_paths)
        cols = tgt.columns
        s_renamed = src.select([F.col(c).alias(f"__s_{c}") for c in cols])
        joined = tgt.join(
            s_renamed, tgt[key] == F.col(f"__s_{key}"), "left_outer"
        )
        matched_flag = F.col(f"__s_{key}").isNotNull()
        # Persist the join output once: the matched-count, the range
        # partitioner's boundary-sampling job, and the rewrite itself
        # would otherwise each re-read the touched files and re-run the
        # join (3 full passes → 1).
        updated = joined.select(
            matched_flag.alias("__matched"),
            *[
                F.when(matched_flag, F.col(f"__s_{c}")).otherwise(tgt[c]).alias(c)
                for c in cols
            ],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_matched = updated.filter("__matched").count()
            new_entries_frames.append(
                _sized_write(table, updated.drop("__matched"), meta, man, touched_rel,
                             target_file_size_bytes, n_salt, range_cols))
        finally:
            updated.unpersist()

    # 3. inserts = source rows whose key is NOT in the target (the probe
    # side of the anti-join is a column-pruned scan of just the key)
    inserts = src.join(target_all.select(key), key, "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_inserts = inserts.count()
    if n_inserts:
        new_entries_frames.append(_sized_write(table, inserts, meta, man, set(),
                                               target_file_size_bytes, n_salt, range_cols))
    inserts.unpersist()

    import pandas as pd

    keep = man[~man["path"].isin(touched_rel)]
    new_man = pd.concat([keep] + new_entries_frames, ignore_index=True) if new_entries_frames else keep
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


def _sized_write(table, df, meta, man, touched_rel, target_bytes, n_salt, range_cols):
    """Range-partition output for file sizing; salt splits hot key ranges."""
    touched_bytes = int(man[man["path"].isin(touched_rel)]["file_size_bytes"].sum())
    n_out = max(1, round(touched_bytes / target_bytes)) if touched_rel else max(
        1, df.sparkSession.sparkContext.defaultParallelism // 4
    )
    parts = [F.col(c) for c in meta.partition_cols] + [F.col(c) for c in range_cols]
    df = df.withColumn(_SALT, F.pmod(F.xxhash64("image_id"), F.lit(n_salt)))
    df = (
        df.repartitionByRange(n_out, *parts, F.col(_SALT))
        .sortWithinPartitions(*parts, F.col(_SALT))
        .drop(_SALT)
    )
    return table.write_files(df)


def _strip(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p
