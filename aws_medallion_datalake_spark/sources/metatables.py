"""Iceberg-style metadata tables over an engine table.

The reference's operational surface inspects its tables through the
catalog: ``DESCRIBE`` checks in the manual validation corpus
(/root/reference/sql/examples/athena_queries_digit.sql:103-106), row-count
reports per table (/root/reference/sql/athena_queries.sql:90-111), and the
quality/metrics tables (/root/reference/scripts/gold_agilean.py:103-162).
Iceberg formalizes the same needs as queryable metadata tables
(``db.t.snapshots`` / ``files`` / ``partitions`` / ``history``); this
module provides those four over our table format so the SQL surface
(SURVEY.md §2.1 S13) can answer operational questions with plain
``spark.sql``.

Scale notes: ``snapshots``/``history`` are driver-built from the metadata
JSON — their size is bounded by the expiry retention policy, not by data
volume. ``files``/``partitions`` read the manifest PARQUET through Spark
(never ``toPandas``), so they scale to 10^8-file manifests exactly like
the planner's Spark pruning path.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableformat import MANIFEST_BASE_COLS, Table

_SNAPSHOTS_DDL = (
    "snapshot_id long, parent_snapshot_id long, committed_at timestamp, "
    "operation string, manifest_paths array<string>, summary map<string,string>, "
    "is_staged boolean, delete_file_count int"
)

_HISTORY_DDL = (
    "made_current_at timestamp, snapshot_id long, parent_snapshot_id long, "
    "is_current_ancestor boolean"
)


def _ts(ms: int) -> datetime:
    # naive UTC datetime: the test/session timezone is pinned to UTC and
    # Spark treats naive datetimes as session-local on ingest
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def _summary_map(summary: dict) -> dict:
    return {
        str(k): v if isinstance(v, str) else json.dumps(v)
        for k, v in summary.items()
    }


def snapshots_df(table: Table, spark: SparkSession) -> DataFrame:
    """One row per retained snapshot (Iceberg's ``$snapshots``), including
    write-audit-publish staging state and the pending merge-on-read
    delete-file count."""
    rows = [
        (
            s.snapshot_id,
            s.parent_snapshot_id,
            _ts(s.timestamp_ms),
            s.operation,
            list(s.manifest_paths),
            _summary_map(s.summary),
            s.summary.get("staged") == "true",
            len(s.delete_paths),
        )
        for s in table.metadata().snapshots
    ]
    return spark.createDataFrame(rows, schema=_SNAPSHOTS_DDL)


def history_df(table: Table, spark: SparkSession) -> DataFrame:
    """Commit history (Iceberg's ``$history``): ``is_current_ancestor``
    marks the snapshots on the parent chain of the CURRENT snapshot —
    after a ``rollback``, abandoned branch commits show ``false``."""
    meta = table.metadata()
    by_id = {s.snapshot_id: s for s in meta.snapshots}
    ancestors = set()
    sid = meta.current_snapshot_id
    while sid is not None and sid in by_id:
        ancestors.add(sid)
        sid = by_id[sid].parent_snapshot_id
    rows = [
        (
            _ts(s.timestamp_ms),
            s.snapshot_id,
            s.parent_snapshot_id,
            s.snapshot_id in ancestors,
        )
        for s in sorted(meta.snapshots, key=lambda s: s.snapshot_id)
    ]
    return spark.createDataFrame(rows, schema=_HISTORY_DDL)


def files_df(
    table: Table, spark: SparkSession, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Data-file inventory of one snapshot (Iceberg's ``$files``): one row
    per file with partition, row count, size, and per-column min/max/null
    stats — the manifest itself, read through Spark."""
    man = table.manifest_df(spark, snapshot_id)
    stat_cols = [c for c in man.columns if c not in MANIFEST_BASE_COLS]
    return man.select(*MANIFEST_BASE_COLS, *sorted(stat_cols))


def partitions_df(
    table: Table, spark: SparkSession, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Per-partition rollup (Iceberg's ``$partitions``): file count, record
    count, and bytes per partition value — a Spark aggregation over the
    manifest, so a 10^8-file table never lands on the driver."""
    return (
        table.manifest_df(spark, snapshot_id)
        .groupBy(F.col("partition_json").alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("record_count").alias("record_count"),
            F.sum("file_size_bytes").alias("total_bytes"),
        )
    )


_MANIFESTS_DDL = (
    "path string, snapshot_id long, file_size_bytes long, entry_count long"
)

_REFS_DDL = "name string, type string, snapshot_id long"


def manifests_df(
    table: Table, spark: SparkSession, snapshot_id: Optional[int] = None
) -> DataFrame:
    """One row per manifest parquet in the snapshot's manifest list with
    its on-disk size and entry count (Iceberg's ``$manifests``). Entry
    counts come from parquet FOOTER metadata only — no manifest data is
    read, so this stays O(manifest-list length) regardless of file count.
    Delta manifests shared with ancestor snapshots appear under each
    snapshot that lists them."""
    import pyarrow.parquet as pq

    s = table.snapshot(snapshot_id)
    rows = [
        (
            rel,
            s.snapshot_id,
            os.path.getsize(os.path.join(table.root, rel)),
            pq.ParquetFile(os.path.join(table.root, rel)).metadata.num_rows,
        )
        for rel in s.manifest_paths
    ]
    return spark.createDataFrame(rows, schema=_MANIFESTS_DDL)


_DELETE_FILES_DDL = (
    "path string, kind string, file_size_bytes long, record_count long, "
    "eq_cols array<string>, as_of_snapshot_id long"
)


def delete_files_df(
    table: Table, spark: SparkSession, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Pending merge-on-read delete files (Iceberg's
    ``$position_deletes`` inventory, plus the equality flavor): one row
    per delete file with kind ('position'|'equality'), size, record
    count (from parquet footers — no data read), the equality key
    columns, and the as-of snapshot the equality delete is sequenced
    against. Empty in the common no-pending-deletes case."""
    import pyarrow.parquet as pq

    rows = []
    for rel in table.pending_delete_paths(snapshot_id):
        p = os.path.join(table.root, rel)
        rows.append(
            (rel, "position", os.path.getsize(p),
             pq.ParquetFile(p).metadata.num_rows, None, None)
        )
    for e in table.pending_eq_deletes(snapshot_id):
        p = os.path.join(table.root, e["path"])
        rows.append(
            (e["path"], "equality", os.path.getsize(p),
             pq.ParquetFile(p).metadata.num_rows, list(e["cols"]),
             int(e["as_of_snapshot_id"]))
        )
    return spark.createDataFrame(rows, schema=_DELETE_FILES_DDL)


def refs_df(table: Table, spark: SparkSession) -> DataFrame:
    """Named references (Iceberg's ``$refs``): the ``main`` head, every
    branch (``Table.create_branch``), and every tag (``Table.tag``)."""
    meta = table.metadata()
    rows = (
        [("main", "branch", meta.current_snapshot_id)]
        if meta.current_snapshot_id is not None
        else []
    )
    rows += [(n, "branch", sid) for n, sid in sorted(table.branches().items())]
    rows += [(n, "tag", sid) for n, sid in sorted(table.tags().items())]
    return spark.createDataFrame(rows, schema=_REFS_DDL)


_COLSTATS_DDL = (
    "column string, ndv long, null_count long, min string, max string, "
    "avg_len double, snapshot_id long, stale boolean"
)


def column_stats_df(table: Table, spark: SparkSession) -> DataFrame:
    """Persisted ANALYZE statistics (``operators.analyze_table``) as a
    relation — Iceberg's Puffin-stats content surfaced like ``$files``.
    Empty (not an error) when the table was never analyzed."""
    cs = table.column_stats()
    if cs is None:
        return spark.createDataFrame([], schema=_COLSTATS_DDL)
    rows = [
        (
            c,
            int(st["ndv"]),
            int(st["null_count"]),
            st.get("min"),
            st.get("max"),
            float(st["avg_len"]) if "avg_len" in st else None,
            cs["snapshot_id"],
            cs["stale"],
        )
        for c, st in sorted(cs["columns"].items())
    ]
    return spark.createDataFrame(rows, schema=_COLSTATS_DDL)


def register_metadata_views(
    table: Table, spark: SparkSession, name: str
) -> dict:
    """Register the metadata tables as temp views named
    ``<name>_snapshots`` / ``_history`` / ``_files`` / ``_partitions`` /
    ``_manifests`` / ``_refs`` / ``_column_stats`` so operational SQL
    runs beside the data views (``Table.register``)."""
    views = {
        f"{name}_snapshots": snapshots_df(table, spark),
        f"{name}_history": history_df(table, spark),
        f"{name}_files": files_df(table, spark),
        f"{name}_partitions": partitions_df(table, spark),
        f"{name}_manifests": manifests_df(table, spark),
        f"{name}_refs": refs_df(table, spark),
        f"{name}_column_stats": column_stats_df(table, spark),
        f"{name}_delete_files": delete_files_df(table, spark),
    }
    for vname, df in views.items():
        df.createOrReplaceTempView(vname)
    return views
