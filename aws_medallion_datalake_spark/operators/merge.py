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

       rewritten = (touched-file rows ANTI-JOIN source keys)
                   UNION (source rows SEMI-JOIN touched-file keys)

   Both joins carry only the key on their small side (a few bytes/row),
   so AQE turns them into broadcast hash joins and **no image payload
   ever shuffles for the join** — payloads move exactly once, into the
   size-targeted output files. A naive full-outer join (the obvious
   translation) sort-merges every payload byte; this formulation removed
   a 730 MB SMJ from the 48k-row benchmark.
3. **Insert** — source rows anti-joined against ALL target keys.
4. **Commit** — old manifest minus touched files plus new entries, as one
   ``merge`` snapshot (readers never see a half-merge).

Skew: the hot-phash tail means matched keys concentrate in a few files;
the rewrite output is routed with the same salted composite-key bucketing
as the clustering rewrite (operators/cluster.py), so output files keep
the table's cluster order AND hot keys split across buckets. The probe
joins run under AQE with skew-join splitting enabled (session default).

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
    n_matched = 0
    if touched_rel:
        touched_paths = [os.path.join(table.root, p) for p in sorted(touched_rel)]
        tgt = spark.read.schema(table._schema(spark)).parquet(*touched_paths)
        cols = tgt.columns
        # MATCHED THEN UPDATE SET * == replace whole row → key-only joins:
        keep = tgt.join(src_keys, key, "left_anti")
        tgt_keys = tgt.select(key)
        updates = src.select(cols).join(tgt_keys, key, "left_semi")
        n_matched = updates.count()  # small (≤ |source|); AQE-broadcast semi
        rewritten = keep.unionByName(updates)
        new_entries_frames.append(
            _sized_write(table, spark, rewritten, meta, man, touched_rel,
                         target_file_size_bytes, n_salt))

    # 3. inserts = source rows whose key is NOT in the target (probe side
    # of the anti-join is a column-pruned scan of just the key)
    inserts = src.join(target_all.select(key), key, "left_anti")
    ins_entries = _sized_write(table, spark, inserts, meta, man, set(),
                               target_file_size_bytes, n_salt)
    n_inserts = int(ins_entries["record_count"].sum()) if len(ins_entries) else 0
    if len(ins_entries):
        new_entries_frames.append(ins_entries)

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


def _sized_write(table, spark, df, meta, man, touched_rel, target_bytes, n_salt):
    """Size-targeted, cluster-order-preserving write of the rewrite set.

    Output partition count comes from the known input bytes (manifest),
    and rows are routed by the same salted Morton composite used by the
    clustering rewrite — merge output files stay clustered, no sampling
    job, no payload re-read. Empty input writes nothing."""
    from .cluster import _composite, exact_route_salts
    from ..functions.udfs import morton64_expr

    if touched_rel:
        in_bytes = int(man[man["path"].isin(touched_rel)]["file_size_bytes"].sum())
    else:  # inserts: estimate from source fraction of table size
        in_bytes = max(1, int(man["file_size_bytes"].sum() // max(1, len(man))))
    n_out = max(1, round(in_bytes / target_bytes))

    key = morton64_expr(F.col("phash"), F.col("w"), F.col("h"))
    sort_cols = [F.col(c) for c in meta.partition_cols] + [F.col("__mk")]
    df = df.withColumn("__mk", key)
    if n_out == 1:
        out = df.coalesce(1).sortWithinPartitions(*sort_cols).drop("__mk")
    else:
        part_values: list = []
        if meta.partition_cols:
            import json as _json

            vals = {
                _json.loads(pj).get(meta.partition_cols[0])
                for pj in man["partition_json"].unique()
            }
            part_values = sorted(v for v in vals if v is not None and v != "__mixed__")
        ck = _composite(F.col("__mk"), meta.partition_cols, part_values)
        pruned_keys = df.select(ck.alias("ck"))
        bounds = sorted(
            int(b)
            for b in pruned_keys.approxQuantile(
                "ck", [i / n_out for i in range(1, n_out)], 1.0 / (4 * n_out)
            )
        )
        salts = exact_route_salts(spark, n_out)
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < ck))
        route = F.element_at(F.array(*[F.lit(s) for s in salts]), bucket + 1).cast("int")
        out = (
            df.withColumn("__rt", route)
            .repartition(n_out, F.col("__rt"))
            .sortWithinPartitions(*sort_cols)
            .drop("__mk", "__rt")
        )
    prefix = table.new_data_prefix()
    out.write.mode("append").parquet(prefix)
    written = os.listdir(prefix)
    if not any(f.endswith(".parquet") for f in written):
        return pd.DataFrame(columns=man.columns)
    return table.collect_stats_for_prefix(spark, prefix)


def _strip(p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p
