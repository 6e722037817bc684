"""Iceberg-style table format implemented from scratch on plain Parquet.

The reference *configures* Iceberg but never exercises it — its jobs do blind
``mode("overwrite")`` Parquet writes with no isolation
(/root/reference/scripts/silver_digit_clean.py:127,
 /root/reference/terraform/glue_digit.tf:54-55 — see SURVEY.md §2.1 S11, §4).
This module implements the mechanics the reference only intended:

- **snapshots**: every commit writes a new immutable manifest + metadata
  version; readers pin a snapshot id → snapshot isolation.
- **manifests**: one Parquet row per data file with partition values, row
  count, byte size, and per-column min/max/null-count stats for the
  configured stats columns (the pruning index for Z-order/Hilbert scans).
- **atomic commit**: write ``vN.metadata.json`` then ``os.replace`` the
  version-hint file — atomic on POSIX. Single-writer assumption (the
  reference is also single-writer: one Step Functions execution at a time,
  /root/reference/terraform/digit_pipeline.tf:6-75).

Layout::

    table_root/
      data/<commit-uuid>/part-*.parquet
      metadata/v1.metadata.json ... vN.metadata.json
      metadata/manifest-<snapshot_id>.parquet
      metadata/version-hint.text

Partitioning is Iceberg-style **metadata partitioning**, not hive paths:
data files always contain every column, and the manifest records per-file
min/max for the partition columns (plus the stats columns). A file whose
partition-column min == max belongs to that partition value
(``partition_json``); writers make files partition-homogeneous by
``repartitionByRange`` on (partition cols, sort key) before writing — the
same mechanism real ingest uses at 10^12 scale. Pruning on the partition
column is just stats pruning, so it needs no directory layout.

Each commit writes its data files under a fresh ``data/<commit-uuid>/``
directory, so "which files did this commit add" is answered by listing that
directory — no guessing against concurrent writers, and aborted writes never
corrupt a committed snapshot (their orphan directories are swept by expiry
GC).

Scale note (10^12 rows ≈ 10^8 files): the manifest is itself columnar
Parquet, so planning reads it as a (pandas or Spark) DataFrame; below
``SPARK_MANIFEST_THRESHOLD`` entries we plan driver-side in pandas (fast,
no job overhead), above it the same pruning predicate runs as a Spark job
over the manifest — both paths share one predicate builder.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import transforms


class CommitConflictError(RuntimeError):
    """A commit lost the metadata-version CAS to a concurrent writer and
    cannot be transparently rebased (non-additive operations encode the
    parent's exact file set). Re-plan against the new head and retry —
    Iceberg's optimistic-concurrency validation failure."""


class TxnAlreadyCommittedError(RuntimeError):
    """An idempotent (txnAppId, txnVersion) commit found its version
    already durable at commit time — the Delta transaction-version
    validation, checked INSIDE the metadata CAS so two concurrent
    writers replaying the same micro-batch cannot both land it."""


SPARK_MANIFEST_THRESHOLD = 2_000_000  # manifest rows before planning moves to Spark

FOOTER_SPARK_THRESHOLD = 512  # files per stats harvest before footer reads fan out

MANIFEST_PART_ROWS = 1_000_000  # rows per manifest part in a Spark rewrite

MANIFEST_BASE_COLS = ["path", "partition_json", "record_count", "file_size_bytes"]

# Iceberg-style write properties (write.parquet.bloom-filter-enabled.column.X
# analogue): parquet FOOTER bloom filters on the named columns. Point
# lookups on a non-sort column (fetch image_id X from a phash-clustered
# 10^12-row table) can't use manifest min/max pruning — every file's id
# range spans the key — but the parquet reader consults the footer bloom
# per row group and skips it without decoding anything. Blooms live in
# the files (where Iceberg keeps them), NOT the manifests: at ~1 bit/row
# a manifest-side bloom would make the planner state O(table rows).
BLOOM_COLS_PROP = "write.parquet.bloom-filter.columns"  # comma-separated
BLOOM_NDV_PROP = "write.parquet.bloom-filter.expected-ndv"  # per row group

# Iceberg resolves columns by FIELD ID, so rename/drop are pure metadata
# ops; plain parquet resolves by NAME. These two properties carry the
# equivalent bookkeeping (Iceberg's schema.name-mapping.default analogue):
# RENAMES_PROP maps each current column name to the list of prior physical
# names still present in not-yet-rewritten data files (newest first);
# RETIRED_PROP lists names that may never be (re-)added, because old data
# files still carry a physical column by that name and a name-resolved
# read would resurrect the wrong values.
RENAMES_PROP = "schema.name-mapping"  # json: {current: [prior, older, ...]}
RETIRED_PROP = "schema.retired-names"  # json: [name, ...]
DEFAULTS_PROP = "schema.column-defaults"  # json: {col: literal}


def bloom_write_options(meta: "TableMetadata") -> dict:
    """DataFrameWriter options implementing the table's bloom properties
    (parquet-mr's ``parquet.bloom.filter.enabled#col`` switches)."""
    cols = [
        c.strip()
        for c in str(meta.properties.get(BLOOM_COLS_PROP, "")).split(",")
        if c.strip()
    ]
    ndv = str(meta.properties.get(BLOOM_NDV_PROP, "100000"))
    opts: dict = {}
    for c in cols:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = ndv
    return opts


@dataclass
class Snapshot:
    snapshot_id: int
    parent_snapshot_id: Optional[int]
    timestamp_ms: int
    operation: str  # append | replace | merge | delete | update | expire
    # manifest LIST (Iceberg-style): the snapshot's file set is the union
    # of these manifest parquets. An append commit writes ONLY a delta
    # manifest and shares its ancestors' manifests, so appending to a
    # 10^8-file table writes O(added files) manifest bytes, not O(table).
    # Rewriting operations (replace/merge/expire) emit one full manifest.
    manifest_paths: list = field(default_factory=list)  # relative to root
    summary: dict = field(default_factory=dict)
    # Merge-on-read positional deletes (Iceberg v2 delete files): parquet
    # files of (path, pos) rows marking data rows as logically deleted.
    # The list is this snapshot's FULL pending set — carried forward by
    # subsequent commits until apply_deletes() materializes them.
    delete_paths: list = field(default_factory=list)  # relative to root
    # Merge-on-read EQUALITY deletes (Iceberg v2's second delete flavor):
    # each entry {"path": <rel parquet of equality-column values>,
    # "cols": [...], "as_of_snapshot_id": N} suppresses every row whose
    # `cols` tuple matches a value row — but ONLY in data files that were
    # already part of the table at `as_of_snapshot_id` (Iceberg sequence-
    # number semantics: a later INSERT of the same key must survive).
    # Like delete_paths, the list is the FULL pending set, carried
    # forward until apply_deletes() materializes it.
    eq_deletes: list = field(default_factory=list)

    @staticmethod
    def from_dict(d: dict) -> "Snapshot":
        d = dict(d)
        # format v1 compat: single `manifest_path` string
        legacy = d.pop("manifest_path", None)
        if legacy is not None and not d.get("manifest_paths"):
            d["manifest_paths"] = [legacy]
        return Snapshot(**d)


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    schema_ddl: str
    partition_cols: list
    stats_cols: list
    current_snapshot_id: Optional[int]
    snapshots: list  # list[Snapshot]
    properties: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "table_uuid": self.table_uuid,
                "location": self.location,
                "schema_ddl": self.schema_ddl,
                "partition_cols": self.partition_cols,
                "stats_cols": self.stats_cols,
                "current_snapshot_id": self.current_snapshot_id,
                "snapshots": [vars(s) for s in self.snapshots],
                "properties": self.properties,
            },
            indent=1,
        )

    @staticmethod
    def from_json(text: str) -> "TableMetadata":
        d = json.loads(text)
        return TableMetadata(
            table_uuid=d["table_uuid"],
            location=d["location"],
            schema_ddl=d["schema_ddl"],
            partition_cols=d["partition_cols"],
            stats_cols=d["stats_cols"],
            current_snapshot_id=d["current_snapshot_id"],
            snapshots=[Snapshot.from_dict(s) for s in d["snapshots"]],
            properties=d.get("properties", {}),
        )


class Table:
    """Handle to one lakehouse table directory."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ---------- creation / loading ----------

    @staticmethod
    def create(
        root: str,
        schema_ddl: str,
        partition_cols: Sequence[str] = (),
        stats_cols: Sequence[str] = (),
        properties: Optional[dict] = None,
    ) -> "Table":
        t = Table(root)
        os.makedirs(t.meta_dir, exist_ok=False)
        os.makedirs(t.data_dir, exist_ok=True)
        meta = TableMetadata(
            table_uuid=str(uuid.uuid4()),
            location=root,
            schema_ddl=schema_ddl,
            partition_cols=list(partition_cols),
            stats_cols=list(stats_cols),
            current_snapshot_id=None,
            snapshots=[],
            properties=properties or {},
        )
        t._write_metadata_version(1, meta)
        return t

    @staticmethod
    def load(root: str) -> "Table":
        t = Table(root)
        t.current_version()  # raises if absent
        return t

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "version-hint.text")) as f:
            return int(f.read().strip())

    def metadata(self, version: Optional[int] = None) -> TableMetadata:
        v = version if version is not None else self.current_version()
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as f:
            return TableMetadata.from_json(f.read())

    def snapshot(self, snapshot_id: Optional[int] = None) -> Snapshot:
        meta = self.metadata()
        sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
        if sid is None:
            raise ValueError("table has no snapshots yet")
        for s in meta.snapshots:
            if s.snapshot_id == sid:
                return s
        raise KeyError(f"snapshot {sid} not found (expired?)")

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot:
        """Time travel: latest snapshot committed at or before the
        timestamp (Iceberg's ``TIMESTAMP AS OF``)."""
        candidates = [
            s for s in self.metadata().snapshots if s.timestamp_ms <= timestamp_ms
        ]
        if not candidates:
            raise KeyError(f"no snapshot at or before {timestamp_ms}")
        return max(candidates, key=lambda s: s.snapshot_id)

    def add_columns(self, ddl: str, defaults: Optional[dict] = None) -> None:
        """Additive schema evolution: append new nullable columns.

        Existing data files simply lack the columns; the explicit-schema
        scan surfaces them as NULL (parquet schema merge by name), so no
        rewrite happens — the Iceberg add-column semantics. Dropping or
        retyping columns is intentionally unsupported (destructive).

        ``defaults`` (Iceberg v3 default-values analogue): ``{col:
        literal}`` for a subset of the added columns. Semantics: the
        column's NULL is not observable — every unset value (files
        written before the column existed, and NULLs written afterwards)
        READS as the default, applied by the single read chokepoint
        (:meth:`read_data`) as ``coalesce(col, default)``. Rewrites
        (compact/cluster/merge) therefore materialize the default
        physically over time, converging to Iceberg's
        initial-default-written state. Because physical NULLs read
        non-null, a defaulted column's manifest stats can no longer
        prove anything — :func:`statable_cols` excludes it from every
        pruning/containment decision (sound: prune less, never wrong).
        """
        from pyspark.sql.types import StructType

        version = self.current_version()
        meta = self.metadata(version)
        # real DDL parse on both sides — naive ','-splitting mis-tokenizes
        # decimal(10,2) / map<k,v> / struct<...> types
        existing = {f.name for f in StructType.fromDDL(meta.schema_ddl).fields}
        new_fields = StructType.fromDDL(ddl).fields
        for f in new_fields:
            if f.name in existing:
                raise ValueError(f"column {f.name!r} already exists")
        retired = set(json.loads(str(meta.properties.get(RETIRED_PROP, "[]"))))
        ren = json.loads(str(meta.properties.get(RENAMES_PROP, "{}")))
        taken = retired | {a for aliases in ren.values() for a in aliases}
        for f in new_fields:
            if f.name in taken:
                raise ValueError(
                    f"column name {f.name!r} was retired by a rename/drop; "
                    "old data files still carry a physical column by that "
                    "name, so re-adding it would resurrect their values"
                )
        if defaults:
            new_names = {f.name for f in new_fields}
            bad = sorted(set(defaults) - new_names)
            if bad:
                raise ValueError(
                    f"defaults for columns not being added: {bad} "
                    "(defaults attach at add-column time only)"
                )
            dfl = json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}")))
            dfl.update({k: v for k, v in defaults.items() if v is not None})
            meta.properties[DEFAULTS_PROP] = json.dumps(dfl)
        meta.schema_ddl = f"{meta.schema_ddl}, {ddl.strip()}"
        self._write_metadata_version(version + 1, meta)

    def _guard_schema_change(self, meta: "TableMetadata", col: str) -> None:
        """Shared rename/drop preconditions."""
        if col in transforms.source_cols(meta.partition_cols):
            raise ValueError(
                f"column {col!r} is a partition source; evolve the "
                "partition spec off it first (set_partition_spec)"
            )
        if meta.current_snapshot_id is not None:
            s = self.snapshot()
            if s.delete_paths or s.eq_deletes:
                raise ValueError(
                    "merge-on-read deletes are pending; run "
                    "apply_deletes() before schema changes (delete files "
                    "reference columns by physical name)"
                )

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only column rename (Iceberg ALTER TABLE ... RENAME).

        No data file is touched: files written before the rename keep the
        old physical column name, and every data-file read goes through
        :meth:`read_data`, which coalesces the name generations into the
        current logical name. Rewrites (compact/cluster/merge/delete)
        migrate files to the new physical name as a side effect, and the
        mapping entry for a generation disappears once expiry GC has
        removed the last file carrying it (kept indefinitely here — it is
        O(renames) bytes). Manifest stats recorded under the old name
        simply stop pruning (missing stats → keep, sound) until the file
        is rewritten. Renaming a partition source column is refused —
        evolve the spec first; renames while merge-on-read deletes are
        pending are refused (delete files reference physical names).
        """
        from pyspark.sql.types import StructType

        version = self.current_version()
        meta = self.metadata(version)
        fields = StructType.fromDDL(meta.schema_ddl).fields
        names = [f.name for f in fields]
        if old not in names:
            raise KeyError(f"no such column: {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        ren = json.loads(str(meta.properties.get(RENAMES_PROP, "{}")))
        retired = json.loads(str(meta.properties.get(RETIRED_PROP, "[]")))
        taken = set(retired) | {a for aliases in ren.values() for a in aliases}
        if new in taken:
            raise ValueError(
                f"column name {new!r} was retired by a prior rename/drop; "
                "old data files still carry it"
            )
        self._guard_schema_change(meta, old)
        meta.schema_ddl = ", ".join(
            f"{new if f.name == old else f.name} {f.dataType.simpleString()}"
            for f in fields
        )
        # chain renames: files may carry ANY prior generation's name
        ren[new] = [old] + ren.pop(old, [])
        meta.properties[RENAMES_PROP] = json.dumps(ren)
        dfl = json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}")))
        if old in dfl:
            dfl[new] = dfl.pop(old)
            meta.properties[DEFAULTS_PROP] = json.dumps(dfl)
        meta.stats_cols = [new if c == old else c for c in meta.stats_cols]
        bloom = [
            c.strip()
            for c in str(meta.properties.get(BLOOM_COLS_PROP, "")).split(",")
            if c.strip()
        ]
        if old in bloom:
            meta.properties[BLOOM_COLS_PROP] = ",".join(
                new if c == old else c for c in bloom
            )
        self._write_metadata_version(version + 1, meta)

    def drop_column(self, name: str) -> None:
        """Metadata-only column drop (Iceberg ALTER TABLE ... DROP COLUMN).

        Data files are untouched; the explicit-schema read simply stops
        projecting the column, and rewrites physically shed it over time.
        The name (and every prior name of the column) is retired: it can
        never be re-added, because not-yet-rewritten files still carry a
        physical column by that name and a name-resolved read would
        resurrect the old values (Iceberg avoids this with field ids).
        Partition sources must be evolved off first; pending merge-on-read
        deletes must be applied first.
        """
        from pyspark.sql.types import StructType

        version = self.current_version()
        meta = self.metadata(version)
        fields = StructType.fromDDL(meta.schema_ddl).fields
        if name not in [f.name for f in fields]:
            raise KeyError(f"no such column: {name!r}")
        if len(fields) == 1:
            raise ValueError("cannot drop the last column")
        self._guard_schema_change(meta, name)
        ren = json.loads(str(meta.properties.get(RENAMES_PROP, "{}")))
        retired = json.loads(str(meta.properties.get(RETIRED_PROP, "[]")))
        retired = sorted(set(retired) | {name} | set(ren.pop(name, [])))
        meta.schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fields if f.name != name
        )
        meta.properties[RENAMES_PROP] = json.dumps(ren)
        meta.properties[RETIRED_PROP] = json.dumps(retired)
        dfl = json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}")))
        if name in dfl:
            del dfl[name]
            meta.properties[DEFAULTS_PROP] = json.dumps(dfl)
        meta.stats_cols = [c for c in meta.stats_cols if c != name]
        bloom = [
            c.strip()
            for c in str(meta.properties.get(BLOOM_COLS_PROP, "")).split(",")
            if c.strip() and c.strip() != name
        ]
        meta.properties[BLOOM_COLS_PROP] = ",".join(bloom)
        self._write_metadata_version(version + 1, meta)

    def empty_relation(self, spark: SparkSession, schema=None) -> DataFrame:
        """Zero-row relation with the table schema that STILL resolves
        ``_metadata`` (a parquet read over a guaranteed-empty directory).
        Every no-files plan (empty scan, fully-pruned scan, empty
        changes/delta_scan) returns this instead of ``createDataFrame([])``
        so downstream projections of ``_metadata.file_path`` — the merge/
        delete probe's rel-path column — analyze identically whether the
        candidate set is empty or not."""
        from pyspark.sql.types import StructType

        sch = (
            schema
            if schema is not None
            else StructType.fromDDL(self.metadata().schema_ddl)
        )
        d = os.path.join(self.root, "metadata", ".empty")
        try:
            os.makedirs(d, exist_ok=True)
        except OSError:
            # read-only storage: degrade to the in-memory empty frame —
            # plain column reads still work; only `_metadata` projections
            # (merge/delete probes, which WRITE anyway) need the parquet
            # relation, and those paths cannot run on read-only roots
            if isinstance(sch, str):
                sch = StructType.fromDDL(sch)
            return spark.createDataFrame([], sch)
        return spark.read.schema(sch).parquet(d)

    def read_data(
        self, spark: SparkSession, paths: Sequence[str], meta=None
    ) -> DataFrame:
        """Read ABSOLUTE data-file paths with the table's logical schema.

        The single chokepoint every engine data-file read goes through.
        With no rename history this is exactly the plain explicit-schema
        parquet read (zero overhead). With renames, the read schema also
        carries each column's prior physical names and the logical column
        becomes ``coalesce(current, prior, older...)`` — parquet's
        name-based resolution yields NULL for whichever generations a
        given file lacks, so every file contributes exactly its own
        generation. ``_metadata`` stays resolvable through the projection
        (merge-on-read delete application relies on it)."""
        from pyspark.sql.types import StructField, StructType

        meta = meta if meta is not None else self.metadata()
        schema = StructType.fromDDL(meta.schema_ddl)
        dfl = json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}")))

        def _with_defaults(df: DataFrame) -> DataFrame:
            # column defaults: NULL is unobservable — unset values (files
            # predating the column, or NULLs written later) read as the
            # default; `_metadata` stays resolvable through the select
            if not dfl:
                return df
            return df.select(
                *[
                    F.coalesce(
                        F.col(f.name), F.lit(dfl[f.name]).cast(f.dataType)
                    ).alias(f.name)
                    if f.name in dfl
                    else F.col(f.name)
                    for f in schema.fields
                ]
            )

        ren = {
            k: v
            for k, v in json.loads(
                str(meta.properties.get(RENAMES_PROP, "{}"))
            ).items()
            if v
        }
        if not ren:
            return _with_defaults(spark.read.schema(schema).parquet(*paths))
        by_name = {f.name: f for f in schema.fields}
        extra = [
            StructField(alias, by_name[cur].dataType, True)
            for cur, aliases in sorted(ren.items())
            if cur in by_name
            for alias in aliases
        ]
        raw = spark.read.schema(StructType(list(schema.fields) + extra)).parquet(
            *paths
        )
        return _with_defaults(
            raw.select(
                *[
                    F.coalesce(f.name, *ren[f.name]).alias(f.name)
                    if f.name in ren
                    else F.col(f.name)
                    for f in schema.fields
                ]
            )
        )

    def set_partition_spec(self, partition_cols: Sequence[str]) -> None:
        """Partition-spec evolution (Iceberg-style, metadata-only).

        Because partitioning here is METADATA partitioning (per-file
        min/max + partition_json in the manifest, no directory layout),
        evolving the spec rewrites nothing: files written under the old
        spec keep their old stats and are simply never pruned on the new
        partition column (missing stats → keep, sound); files written
        after the change collect stats for — and route by — the new
        spec. This is exactly Iceberg's split-planning behavior across
        spec ids. Columns must exist in the schema; pass the FULL new
        spec (it replaces, not appends)."""
        from pyspark.sql.types import StructType

        version = self.current_version()
        meta = self.metadata(version)
        fields = {f.name for f in StructType.fromDDL(meta.schema_ddl).fields}
        # entries may be hidden-partitioning transforms — parse validates
        # the syntax, and the TRANSFORM SOURCE columns must exist
        missing = [
            c for c in transforms.source_cols(partition_cols) if c not in fields
        ]
        if missing:
            raise KeyError(f"partition source columns not in schema: {missing}")
        meta.partition_cols = list(partition_cols)
        self._write_metadata_version(version + 1, meta)

    def set_properties(self, props: dict) -> None:
        """Upsert table properties (Iceberg ALTER TABLE … SET TBLPROPERTIES).

        Metadata-only version bump; a value of ``None`` unsets the key
        (UNSET TBLPROPERTIES). Reserved engine keys (``branch.*``,
        ``ref.*`` — managed by the branch/tag APIs) are refused so a
        property write can't silently move a ref head."""
        version = self.current_version()
        meta = self.metadata(version)
        for k in props:
            if k.startswith(("branch.", "ref.")):
                raise ValueError(
                    f"property {k!r} is a managed ref; use tag()/"
                    "create_branch()/drop_* instead"
                )
            if k.startswith("constraint."):
                raise ValueError(
                    f"property {k!r} is managed; use add_constraint() / "
                    "drop_constraint() (existing data must be validated)"
                )
        for k, v in props.items():
            if v is None:
                meta.properties.pop(k, None)
            else:
                meta.properties[k] = str(v)
        self._write_metadata_version(version + 1, meta)

    # ---------- type widening (Iceberg type promotion) ----------

    _WIDEN_INT_ORDER = ("tinyint", "smallint", "int", "bigint")

    def widen_column(
        self, name: str, new_type: str, spark: Optional[SparkSession] = None
    ) -> None:
        """Iceberg-style type promotion: widen a column to a superset
        type (int family → any wider int, float → double). For DATA this
        is metadata-only — the parquet reader upcasts narrow physical
        files under the widened read schema, so no file is rewritten and
        later rewrites migrate files physically as a side effect. The
        MANIFEST STATS columns, however, are normalized to the widened
        type FIRST in one physical-only replace commit: Spark's
        mergeSchema manifest read cannot reconcile an int32 ``min_<c>``
        in an old manifest with the int64 one a post-widen append would
        write. Crash between the two steps leaves widened stats under
        the old schema — wider stats describing narrower data prune
        soundly, so the order is safe. Old snapshots keep their own
        (homogeneous) manifests; time travel is unaffected.

        ``spark``: required only when the manifest exceeds the planner
        threshold — the stats cast then runs as a Spark job and the
        manifest never materializes on the driver."""
        from pyspark.sql.types import StructType

        new_t = new_type.strip().lower()
        meta = self.metadata()
        fields = StructType.fromDDL(meta.schema_ddl).fields
        cur_map = {f.name: f.dataType.simpleString() for f in fields}
        if name not in cur_map:
            raise KeyError(f"unknown column {name!r}")
        cur_t = cur_map[name]
        ints = self._WIDEN_INT_ORDER
        ok = (
            cur_t in ints
            and new_t in ints
            and ints.index(new_t) > ints.index(cur_t)
        ) or (cur_t == "float" and new_t == "double")
        if not ok:
            raise ValueError(
                f"cannot widen {name!r}: {cur_t} -> {new_t} (allowed: "
                f"int family -> wider int, float -> double)"
            )
        if meta.current_snapshot_id is not None:
            stat_cols = (f"min_{name}", f"max_{name}")
            if self.manifest_rows() > SPARK_MANIFEST_THRESHOLD:
                if spark is None:
                    raise ValueError(
                        "manifest exceeds the planner threshold: pass a "
                        "SparkSession so the stats cast runs distributed"
                    )
                mdf = self.manifest_df(spark)
                present = [c for c in stat_cols if c in mdf.columns]
                if present:
                    for c in present:
                        mdf = mdf.withColumn(c, F.col(c).cast(new_t))
                    tot = mdf.agg(
                        F.count("*").alias("files"),
                        F.sum("record_count").alias("records"),
                        F.sum("file_size_bytes").alias("bytes"),
                    ).collect()[0]
                    n_parts = max(
                        1, -(-int(tot["files"]) // MANIFEST_PART_ROWS)
                    )
                    rel_dir = os.path.join(
                        "metadata", f"manifest-wd-{uuid.uuid4().hex}"
                    )
                    mdf.repartition(n_parts).write.parquet(
                        os.path.join(self.root, rel_dir)
                    )
                    rel_paths = sorted(
                        os.path.join(rel_dir, f)
                        for f in os.listdir(os.path.join(self.root, rel_dir))
                        if f.endswith(".parquet")
                    )
                    self._commit_manifest_list(
                        "replace",
                        rel_paths,
                        dict(
                            added_or_total_files=int(tot["files"]),
                            total_records=int(tot["records"] or 0),
                            total_bytes=int(tot["bytes"] or 0),
                        ),
                        {"stage": "widen_column_manifests", "column": name,
                         "to": new_t},
                    )
            else:
                man = self.manifest_pdf()
                present = [c for c in stat_cols if c in man.columns]
                if present:
                    dtype = {
                        "smallint": "Int16", "int": "Int32",
                        "bigint": "Int64", "double": "float64",
                    }[new_t]
                    man = man.copy()
                    for c in present:
                        man[c] = man[c].astype(dtype)
                    self.commit(
                        "replace", man,
                        {"stage": "widen_column_manifests", "column": name,
                         "to": new_t},
                    )
        version = self.current_version()
        meta = self.metadata(version)
        new_ddl = ", ".join(
            f"{f.name} {new_t if f.name == name else f.dataType.simpleString()}"
            for f in StructType.fromDDL(meta.schema_ddl).fields
        )
        meta.schema_ddl = new_ddl
        self._write_metadata_version(version + 1, meta)

    # ---------- CHECK constraints ----------

    def constraints(self) -> dict:
        """Active CHECK constraints: {name: condition_sql}."""
        return {
            k[len("constraint."):]: v
            for k, v in self.metadata().properties.items()
            if k.startswith("constraint.")
        }

    def add_constraint(
        self, spark: SparkSession, name: str, condition_sql: str
    ) -> None:
        """Delta-style table CHECK constraint (``ALTER TABLE … ADD
        CONSTRAINT <name> CHECK (<expr>)``): every subsequent data-file
        write evaluates the condition row-level inside the write job
        (SQL tri-state — NULL passes, only FALSE violates) and fails the
        write on a violation. Like Delta, ADDING the constraint first
        validates the EXISTING table data with one predicate-only scan;
        a table whose history already violates the condition refuses the
        constraint rather than leaving enforcement half-true."""
        if not re.match(r"^[A-Za-z_]\w*$", name):
            raise ValueError(f"invalid constraint name {name!r}")
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists")
        cond = F.expr(condition_sql)
        if self.metadata().current_snapshot_id is not None:
            bad = (
                self.scan(spark)
                .filter(~F.coalesce(cond, F.lit(True)))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"existing rows violate CHECK ({condition_sql}); "
                    f"constraint {name!r} not added"
                )
        else:
            # no data yet: still resolve the expression against the
            # declared schema so a typo fails now, not at first write
            self.empty_relation(spark).filter(cond)
        version = self.current_version()
        meta = self.metadata(version)
        meta.properties[f"constraint.{name}"] = condition_sql
        self._write_metadata_version(version + 1, meta)

    def drop_constraint(self, name: str) -> None:
        """Remove a CHECK constraint (metadata-only)."""
        if name not in self.constraints():
            raise KeyError(f"unknown constraint {name!r}")
        version = self.current_version()
        meta = self.metadata(version)
        meta.properties.pop(f"constraint.{name}", None)
        self._write_metadata_version(version + 1, meta)

    # ---------- manifests ----------

    def manifest_abs_paths(self, snapshot_id: Optional[int] = None) -> list:
        """Absolute paths of the snapshot's manifest list."""
        s = self.snapshot(snapshot_id)
        return [os.path.join(self.root, p) for p in s.manifest_paths]

    def manifest_rows(self, snapshot_id: Optional[int] = None) -> int:
        """Manifest entry count (= data-file count) from parquet footers —
        no manifest read; drives the pandas-vs-Spark planner split."""
        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in self.manifest_abs_paths(snapshot_id)
        )

    def manifest_pdf(self, snapshot_id: Optional[int] = None) -> pd.DataFrame:
        """Manifest as pandas (planner-side). Columns: MANIFEST_BASE_COLS +
        min_<c>/max_<c>/nulls_<c> per stats column."""
        parts = [
            pq.read_table(p).to_pandas()
            for p in self.manifest_abs_paths(snapshot_id)
        ]
        return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)

    def manifest_df(self, spark: SparkSession, snapshot_id: Optional[int] = None) -> DataFrame:
        """Manifest as a Spark DataFrame (the ≥ SPARK_MANIFEST_THRESHOLD path).

        ``mergeSchema``: manifests written before a partition-spec or
        stats-spec evolution lack the newer min/max columns — the merged
        read surfaces them as NULL, which the pruners treat as
        "no stats → keep" (sound)."""
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(*self.manifest_abs_paths(snapshot_id))
        )

    def _write_manifest(self, snapshot_id: int, entries: pd.DataFrame) -> str:
        rel = os.path.join("metadata", f"manifest-{snapshot_id}.parquet")
        tbl = pa.Table.from_pandas(entries, preserve_index=False)
        # an ALL-NULL stats column (e.g. min_v of a file whose v is
        # entirely null) infers arrow's `null` type, which Spark's
        # mergeSchema manifest read cannot reconcile with the typed
        # column in sibling manifests — promote to the TABLE column's
        # type (min_/max_ of col c carry c's type; nulls_/counts int64)
        null_cols = [f_.name for f_ in tbl.schema if pa.types.is_null(f_.type)]
        if null_cols:
            types = _ddl_arrow_types(self.metadata().schema_ddl)
            for name in null_cols:
                if name.startswith(("min_", "max_")):
                    t = types.get(name.split("_", 1)[1], pa.string())
                else:
                    t = pa.int64()
                i = tbl.schema.get_field_index(name)
                tbl = tbl.set_column(
                    i, pa.field(name, t), pa.nulls(len(tbl), t)
                )
        # write-then-link: a concurrent writer racing to the same snapshot
        # id must never OVERWRITE a manifest the winner's commit already
        # references — os.link fails on an existing target, and the loser
        # falls back to a uniquified name (its commit CAS will also retry)
        tmp = os.path.join(
            self.root, "metadata", f".manifest-{uuid.uuid4().hex}.tmp"
        )
        pq.write_table(tbl, tmp)
        try:
            os.link(tmp, os.path.join(self.root, rel))
        except FileExistsError:
            rel = os.path.join(
                "metadata", f"manifest-{snapshot_id}-{uuid.uuid4().hex[:8]}.parquet"
            )
            os.link(tmp, os.path.join(self.root, rel))
        finally:
            os.unlink(tmp)
        return rel

    # ---------- commit protocol ----------

    def _write_metadata_version(self, version: int, meta: TableMetadata) -> None:
        mpath = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        with open(mpath, "x") as f:  # 'x': fail loudly if version exists
            f.write(meta.to_json())
        tmp = os.path.join(self.meta_dir, f".version-hint.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.meta_dir, "version-hint.text"))

    def commit(
        self,
        operation: str,
        new_manifest: pd.DataFrame,
        summary: Optional[dict] = None,
        properties: Optional[dict] = None,
        stage_only: bool = False,
        wap_id: Optional[str] = None,
        delete_paths: Optional[list] = None,
        eq_deletes: Optional[list] = None,
        reuse_manifests: bool = False,
        delta_manifest: bool = False,
        branch: Optional[str] = None,
        max_retries: int = 5,
        txn: Optional[tuple] = None,
    ) -> Snapshot:
        """Commit with optimistic concurrency (Iceberg's commit protocol):
        the metadata-version CAS (``open(…, "x")``) detects a concurrent
        writer; ADD-ONLY commits (append / ``delta_manifest``) commute
        with any winner, so they are transparently REBASED — re-read the
        new head, recompute the shared manifest list, retry — up to
        ``max_retries`` times. Non-additive commits (replace / merge /
        expire / merge-on-read deletes) encode assumptions about the
        parent's exact file set, so a lost race raises
        :class:`CommitConflictError` and the caller re-plans against the
        new head (exactly Iceberg's validation failure).

        ``txn=(property_name, version)``: idempotent-sink validation —
        the commit aborts with :class:`TxnAlreadyCommittedError` if the
        named table property is already ≥ ``version`` AT COMMIT TIME.
        Because the check re-runs inside every CAS attempt against the
        freshly-read metadata, two concurrent writers replaying the same
        (txnAppId, batchId) cannot both commit: the loser's CAS fails,
        its retry re-reads the winner's property, and it aborts."""
        additive = operation == "append" or delta_manifest
        attempts = max(1, max_retries + 1) if additive else 1
        last: Optional[BaseException] = None
        for _ in range(attempts):
            try:
                return self._commit_once(
                    operation,
                    new_manifest,
                    summary=summary,
                    properties=properties,
                    stage_only=stage_only,
                    wap_id=wap_id,
                    delete_paths=delete_paths,
                    eq_deletes=eq_deletes,
                    reuse_manifests=reuse_manifests,
                    delta_manifest=delta_manifest,
                    branch=branch,
                    txn=txn,
                )
            except FileExistsError as e:
                last = e
                if not additive:
                    raise CommitConflictError(
                        f"{operation!r} commit lost a race with a concurrent "
                        f"writer; re-plan against the new table head"
                    ) from e
                time.sleep(0.01 * (1 + (uuid.uuid4().int & 7)))
        raise CommitConflictError(
            f"append commit still conflicting after {attempts} attempts"
        ) from last

    def _commit_once(
        self,
        operation: str,
        new_manifest: pd.DataFrame,
        summary: Optional[dict] = None,
        properties: Optional[dict] = None,
        stage_only: bool = False,
        wap_id: Optional[str] = None,
        delete_paths: Optional[list] = None,
        eq_deletes: Optional[list] = None,
        reuse_manifests: bool = False,
        delta_manifest: bool = False,
        branch: Optional[str] = None,
        txn: Optional[tuple] = None,
    ) -> Snapshot:
        """Commit the next snapshot (atomic).

        ``operation == "append"``: ``new_manifest`` holds only the ADDED
        files; they are written as a DELTA manifest and the snapshot's
        manifest LIST shares every ancestor manifest — an append to a
        10^8-file table writes O(added) manifest bytes. Any other
        operation (replace/merge/expire): ``new_manifest`` IS the full new
        file list, written as a single fresh manifest.

        ``properties`` are merged into the table properties in the SAME
        metadata version — the non-prunable state streaming sinks use for
        per-app transaction versions (snapshot summaries can be expired;
        properties survive every expiry).

        ``stage_only`` (write-audit-publish): the snapshot is written to
        the log but the current pointer does NOT move — readers keep
        seeing the pre-commit table while an audit job scans the staged
        snapshot by id (``scan(snapshot_id=...)``) and runs its quality
        gate. ``publish()`` then fast-forwards (or cherry-picks an
        append) to make it visible. Iceberg's ``spark.wap.id`` staged
        commit. ``wap_id`` is the audit handle recorded in the summary.

        ``delete_paths``: the snapshot's merge-on-read positional-delete
        file set. ``None`` (default) carries the parent's pending set
        forward — appends/stages never clear deletes; ``apply_deletes``
        passes ``[]`` explicitly. ``reuse_manifests``: the file set is
        UNCHANGED (a merge-on-read delete touches zero data files) — the
        snapshot shares the parent's manifest list verbatim and writes no
        manifest bytes at all; ``new_manifest`` must be empty.
        ``delta_manifest``: the commit only ADDS files (removes none), so
        ``new_manifest`` holds just the additions and the manifest list
        shares every ancestor manifest, append-style — the merge-on-read
        MERGE uses this to keep manifest IO O(delta) under a non-append
        operation name.

        ``branch``: commit onto the named branch (``create_branch``)
        instead of ``main`` — the snapshot parents on the BRANCH head and
        only the ``branch.<name>`` pointer advances; readers of main see
        nothing until ``fast_forward``. Iceberg branch-write semantics
        (``write.branch``); mutually exclusive with ``stage_only`` (WAP
        staging is the single-commit special case of a branch).
        """
        version = self.current_version()
        meta = self.metadata(version)
        if txn is not None:
            txn_prop, txn_version = txn
            if int(meta.properties.get(str(txn_prop), -1)) >= int(txn_version):
                raise TxnAlreadyCommittedError(
                    f"{txn_prop}={txn_version} already committed "
                    f"(duplicate idempotent-sink replay)"
                )
        if branch is not None:
            if stage_only:
                raise ValueError("branch commits and stage_only are exclusive")
            head_id = self._branch_head(meta, branch)
        else:
            head_id = meta.current_snapshot_id
        if properties:
            meta.properties.update({str(k): str(v) for k, v in properties.items()})
        # next id = max over HISTORY, not current+1: after rollback() the
        # current pointer sits on an old snapshot while later ids still
        # exist in the log — current+1 would overwrite their manifests
        sid = max((s.snapshot_id for s in meta.snapshots), default=0) + 1
        added_records = int(new_manifest["record_count"].sum()) if len(new_manifest) else 0
        added_bytes = int(new_manifest["file_size_bytes"].sum()) if len(new_manifest) else 0
        if delete_paths is None or eq_deletes is None:
            parent_for_deletes = (
                self.snapshot(head_id) if head_id is not None else None
            )
            if delete_paths is None:
                delete_paths = (
                    list(parent_for_deletes.delete_paths) if parent_for_deletes else []
                )
            if eq_deletes is None:
                eq_deletes = (
                    list(parent_for_deletes.eq_deletes) if parent_for_deletes else []
                )
        if reuse_manifests:
            if len(new_manifest):
                raise ValueError("reuse_manifests commits add no files")
            parent = self.snapshot(head_id)
            manifest_paths = list(parent.manifest_paths)
            ps = parent.summary
            totals = dict(
                added_or_total_files=int(
                    ps.get(
                        "added_or_total_files",
                        self.manifest_rows(parent.snapshot_id),
                    )
                ),
                total_records=int(ps.get("total_records", 0)),
                total_bytes=int(ps.get("total_bytes", 0)),
            )
        elif (
            operation == "append" or delta_manifest
        ) and head_id is not None:
            parent = self.snapshot(head_id)
            manifest_paths = list(parent.manifest_paths)
            if len(new_manifest):
                manifest_paths.append(self._write_manifest(sid, new_manifest))
            ps = parent.summary
            if "added_or_total_files" in ps:
                total_files = int(ps["added_or_total_files"])
            else:  # snapshot from an external writer: count the footers
                total_files = self.manifest_rows(parent.snapshot_id)
            totals = dict(
                added_or_total_files=total_files + int(len(new_manifest)),
                total_records=int(ps.get("total_records", 0)) + added_records,
                total_bytes=int(ps.get("total_bytes", 0)) + added_bytes,
            )
        else:
            manifest_paths = [self._write_manifest(sid, new_manifest)]
            totals = dict(
                added_or_total_files=int(len(new_manifest)),
                total_records=added_records,
                total_bytes=added_bytes,
            )
        extra = {"staged": "true", "wap.id": wap_id or ""} if stage_only else {}
        snap = Snapshot(
            snapshot_id=sid,
            parent_snapshot_id=head_id,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifest_paths=manifest_paths,
            summary=dict(summary or {}, **totals, **extra),
            delete_paths=delete_paths,
            eq_deletes=eq_deletes,
        )
        meta.snapshots.append(snap)
        if branch is not None:
            meta.properties[f"branch.{branch}"] = str(sid)
        elif not stage_only:
            meta.current_snapshot_id = sid
        self._write_metadata_version(version + 1, meta)
        return snap

    def rewrite_manifests(
        self,
        min_manifests: int = 2,
        spark: Optional[SparkSession] = None,
        force_spark: bool = False,
    ) -> Optional[Snapshot]:
        """Compact the current snapshot's manifest LIST into one manifest
        (Iceberg's ``rewriteManifests``): long append chains accumulate one
        delta manifest per commit, which taxes every scan's footer reads.
        Physical metadata reorganization only — committed as a ``replace``
        so incremental consumers (``changes``) correctly see no new rows.
        No-op (returns None) when the list is already small.

        Same planner split as scan/compact/expire: below
        ``SPARK_MANIFEST_THRESHOLD`` entries the rewrite is a driver-side
        pandas concat; above it (``spark`` given, or ``force_spark``) the
        manifest is re-sharded BY SPARK into ``MANIFEST_PART_ROWS``-row
        parquet parts — a 10^8-file manifest (~10 GB) never materializes
        on the driver."""
        s = self.snapshot()
        if len(s.manifest_paths) < max(2, min_manifests):
            return None
        use_spark = spark is not None and (
            force_spark or self.manifest_rows() > SPARK_MANIFEST_THRESHOLD
        )
        if not use_spark:
            return self.commit(
                "replace",
                self.manifest_pdf(),
                {"stage": "rewrite_manifests", "manifests_in": len(s.manifest_paths)},
            )
        mdf = self.manifest_df(spark)
        tot = mdf.agg(
            F.count("*").alias("files"),
            F.sum("record_count").alias("records"),
            F.sum("file_size_bytes").alias("bytes"),
        ).collect()[0]
        n_parts = max(1, -(-int(tot["files"]) // MANIFEST_PART_ROWS))
        rel_dir = os.path.join("metadata", f"manifest-rw-{uuid.uuid4().hex}")
        mdf.repartition(n_parts).write.parquet(os.path.join(self.root, rel_dir))
        out_dir = os.path.join(self.root, rel_dir)
        rel_paths = sorted(
            os.path.join(rel_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
        return self._commit_manifest_list(
            "replace",
            rel_paths,
            dict(
                added_or_total_files=int(tot["files"]),
                total_records=int(tot["records"] or 0),
                total_bytes=int(tot["bytes"] or 0),
            ),
            {
                "stage": "rewrite_manifests",
                "manifests_in": len(s.manifest_paths),
                "spark_path": "true",
            },
        )

    def _commit_manifest_list(
        self,
        operation: str,
        manifest_paths: list,
        totals: dict,
        summary: Optional[dict] = None,
        properties: Optional[dict] = None,
    ) -> Snapshot:
        """Commit tail for manifests ALREADY WRITTEN (by Spark executors):
        same snapshot/metadata bookkeeping as ``commit`` without routing the
        entry rows through the driver."""
        version = self.current_version()
        meta = self.metadata(version)
        if properties:
            meta.properties.update({str(k): str(v) for k, v in properties.items()})
        sid = max((s.snapshot_id for s in meta.snapshots), default=0) + 1
        # a manifest rewrite reorganizes metadata only — the pending
        # merge-on-read delete set must survive it
        parent_deletes = (
            list(self.snapshot(meta.current_snapshot_id).delete_paths)
            if meta.current_snapshot_id is not None
            else []
        )
        snap = Snapshot(
            snapshot_id=sid,
            parent_snapshot_id=meta.current_snapshot_id,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifest_paths=list(manifest_paths),
            summary=dict(summary or {}, **totals),
            delete_paths=parent_deletes,
        )
        meta.snapshots.append(snap)
        meta.current_snapshot_id = sid
        try:
            self._write_metadata_version(version + 1, meta)
        except FileExistsError as e:
            raise CommitConflictError(
                f"{operation!r} commit lost a race with a concurrent "
                f"writer; re-plan against the new table head"
            ) from e
        return snap

    # ---------- named refs (tags) ----------

    def tag(self, name: str, snapshot_id: Optional[int] = None) -> int:
        """Iceberg-style named ref: pin a snapshot under ``ref.<name>``
        (default: the current snapshot). Tagged snapshots are RETAINED by
        ``expire_snapshots`` regardless of its keep policy — the audit /
        reproducibility handle ("the snapshot we trained run X on").
        Metadata-only version bump; no snapshot is created."""
        version = self.current_version()
        meta = self.metadata(version)
        sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
        if sid not in {s.snapshot_id for s in meta.snapshots}:
            raise KeyError(f"snapshot {sid} not in table history")
        meta.properties[f"ref.{name}"] = str(sid)
        self._write_metadata_version(version + 1, meta)
        return sid

    def column_stats(self) -> Optional[dict]:
        """Column statistics persisted by ``operators.analyze_table``
        (Iceberg ANALYZE/Puffin analogue), or None if never analyzed.
        ``stale`` is True when the table advanced past the snapshot the
        stats were computed at — consumers decide whether approximate
        planner stats may lag (usually yes) or must be recomputed."""
        meta = self.metadata()
        raw = meta.properties.get("stats.columns")
        if raw is None:
            return None
        sid = int(meta.properties.get("stats.snapshot-id", -1))
        return {
            "columns": json.loads(str(raw)),
            "snapshot_id": sid,
            "row_count": int(meta.properties.get("stats.row-count", -1)),
            "analyzed_at_ms": int(meta.properties.get("stats.analyzed-at-ms", 0)),
            "stale": sid != meta.current_snapshot_id,
        }

    def drop_tag(self, name: str) -> None:
        version = self.current_version()
        meta = self.metadata(version)
        if meta.properties.pop(f"ref.{name}", None) is None:
            raise KeyError(f"no tag {name!r}")
        self._write_metadata_version(version + 1, meta)

    def ref(self, name: str) -> int:
        """Snapshot id a tag points at (scan it via
        ``scan(snapshot_id=table.ref(name))``)."""
        v = self.metadata().properties.get(f"ref.{name}")
        if v is None:
            raise KeyError(f"no tag {name!r}")
        return int(v)

    def tags(self) -> dict:
        """All named refs: {name: snapshot_id}."""
        return {
            k[len("ref."):]: int(v)
            for k, v in self.metadata().properties.items()
            if k.startswith("ref.")
        }

    # ---------- named refs (branches) ----------

    def _branch_head(self, meta: "TableMetadata", name: str) -> int:
        v = meta.properties.get(f"branch.{name}")
        if v is None:
            raise KeyError(f"no branch {name!r}")
        return int(v)

    def create_branch(self, name: str, snapshot_id: Optional[int] = None) -> int:
        """Iceberg-style branch: an independently-advancing named head.
        Commits target it with ``commit(..., branch=name)``; readers pin
        it via ``scan(branch=name)``; ``fast_forward`` publishes it into
        main. Starts at ``snapshot_id`` (default: current). Branch-
        reachable files are protected from ``expire_snapshots`` GC while
        the branch exists. Metadata-only; no snapshot is created."""
        version = self.current_version()
        meta = self.metadata(version)
        if f"branch.{name}" in meta.properties:
            raise ValueError(f"branch {name!r} already exists")
        sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
        if sid not in {s.snapshot_id for s in meta.snapshots}:
            raise KeyError(f"snapshot {sid} not in table history")
        meta.properties[f"branch.{name}"] = str(sid)
        self._write_metadata_version(version + 1, meta)
        return int(sid)

    def drop_branch(self, name: str) -> None:
        """Remove the branch pointer. Snapshots that only the branch
        reached become expirable — the next ``expire_snapshots`` GCs the
        abandoned branch's files."""
        version = self.current_version()
        meta = self.metadata(version)
        if meta.properties.pop(f"branch.{name}", None) is None:
            raise KeyError(f"no branch {name!r}")
        self._write_metadata_version(version + 1, meta)

    def branch_head(self, name: str) -> int:
        """Snapshot id the branch head points at."""
        return self._branch_head(self.metadata(), name)

    def branches(self) -> dict:
        """All branches: {name: head snapshot_id}."""
        return {
            k[len("branch."):]: int(v)
            for k, v in self.metadata().properties.items()
            if k.startswith("branch.")
        }

    def fast_forward(self, name: str) -> Snapshot:
        """Publish a branch into main (Iceberg ``fast_forward``): move the
        current pointer to the branch head, REQUIRING that main is an
        ancestor of it — i.e. main gained no commits since the branch was
        cut, so the branch's snapshots linearize onto main verbatim. A
        diverged main raises (a branch of appends can instead be replayed
        commit-by-commit with ``publish``-style cherry-picks; rewrites
        cannot, their manifests encode the branch parent's file set).
        Metadata-only."""
        version = self.current_version()
        meta = self.metadata(version)
        head = self._branch_head(meta, name)
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        sid: Optional[int] = head
        on_chain = False
        while sid is not None and sid in by_id:
            if sid == meta.current_snapshot_id:
                on_chain = True
                break
            sid = by_id[sid].parent_snapshot_id
        if not (on_chain or meta.current_snapshot_id is None):
            raise ValueError(
                f"main diverged from branch {name!r}: snapshot "
                f"{meta.current_snapshot_id} is not an ancestor of the "
                f"branch head {head}"
            )
        meta.current_snapshot_id = head
        self._write_metadata_version(version + 1, meta)
        return self.snapshot(head)

    def rollback(self, snapshot_id: int) -> Snapshot:
        """Iceberg-style rollback: a NEW metadata version whose current
        pointer returns to an earlier snapshot. History is preserved —
        time travel still reads the rolled-back snapshots until
        ``expire_snapshots`` reaps them — and the next ``commit`` branches
        from here with a fresh (never-reused) snapshot id."""
        version = self.current_version()
        meta = self.metadata(version)
        if snapshot_id not in {s.snapshot_id for s in meta.snapshots}:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        meta.current_snapshot_id = int(snapshot_id)
        self._write_metadata_version(version + 1, meta)
        return self.snapshot(snapshot_id)

    # ---------- write-audit-publish (staged commits) ----------

    def staged_snapshots(self) -> list:
        """Unpublished staged snapshots (``commit(stage_only=True)``),
        oldest first."""
        return [
            s
            for s in self.metadata().snapshots
            if s.summary.get("staged") == "true"
        ]

    def _find_staged(self, wap_id: Optional[str], snapshot_id: Optional[int]) -> Snapshot:
        staged = self.staged_snapshots()
        if snapshot_id is not None:
            for s in staged:
                if s.snapshot_id == snapshot_id:
                    return s
            raise KeyError(f"snapshot {snapshot_id} is not staged")
        if wap_id:
            hits = [s for s in staged if s.summary.get("wap.id") == wap_id]
            if not hits:
                raise KeyError(f"no staged snapshot with wap.id {wap_id!r}")
            if len(hits) > 1:
                raise ValueError(f"wap.id {wap_id!r} is ambiguous ({len(hits)} staged)")
            return hits[0]
        raise ValueError("publish() needs wap_id or snapshot_id")

    def _own_delta_pdf(self, s: Snapshot) -> pd.DataFrame:
        """Manifest rows ADDED BY snapshot ``s`` itself. An append commit
        writes exactly one delta manifest named with its own snapshot id —
        identifiable even after the parent expired (expiry pins a staged
        snapshot, not its ancestry)."""
        own = (f"manifest-{s.snapshot_id}.parquet", f"manifest-{s.snapshot_id}-")
        delta = [
            p
            for p in s.manifest_paths
            if os.path.basename(p) == own[0]
            or os.path.basename(p).startswith(own[1])
        ]
        if not delta:
            return pd.DataFrame(columns=MANIFEST_BASE_COLS)
        return pd.concat(
            [pq.read_table(os.path.join(self.root, p)).to_pandas() for p in delta],
            ignore_index=True,
        )

    def delta_scan(
        self,
        spark: SparkSession,
        snapshot_id: int,
        columns: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        """Read ONLY the rows an append snapshot added — the audit surface
        of write-audit-publish: the gate profiles the staged delta, not
        staged-delta ∪ all-prior-data (whose errors are already
        published history). Works on staged and published appends alike."""
        s = self.snapshot(snapshot_id)
        if s.operation != "append":
            raise ValueError(
                f"delta_scan reads append deltas; snapshot {snapshot_id} "
                f"is a {s.operation!r} (rewrites add no logical rows)"
            )
        pdf = self._own_delta_pdf(s)
        if pdf.empty:
            empty = self.empty_relation(spark)
            return empty.select(*columns) if columns else empty
        df = self.read_data(
            spark, [os.path.join(self.root, p) for p in pdf["path"]]
        )
        return df.select(*columns) if columns else df

    def drop_staged(
        self,
        wap_id: Optional[str] = None,
        snapshot_id: Optional[int] = None,
    ) -> Snapshot:
        """Abandon a staged snapshot that failed its audit: remove it from
        the snapshot log so its files become unreachable. Physical cleanup
        is the existing orphan sweep's job (``remove_orphan_files``) —
        dropping is metadata-only and safe under concurrent readers."""
        found = self._find_staged(wap_id, snapshot_id)
        version = self.current_version()
        meta = self.metadata(version)
        meta.snapshots = [
            s for s in meta.snapshots if s.snapshot_id != found.snapshot_id
        ]
        self._write_metadata_version(version + 1, meta)
        return found

    def publish(
        self,
        wap_id: Optional[str] = None,
        snapshot_id: Optional[int] = None,
    ) -> Snapshot:
        """Make a staged snapshot visible (Iceberg ``cherrypick_snapshot``):

        - staged on the CURRENT snapshot → **fast-forward**: the current
          pointer moves to it (metadata-only, no new snapshot);
        - an ``append`` staged on an OLDER snapshot → **cherry-pick**: its
          delta manifests are re-applied onto the current snapshot as a
          NEW append commit (no data is rewritten — appends commute);
        - any other staged operation on an older snapshot → error: a
          rewrite's full manifest encodes the file set of its own parent,
          so replaying it over a diverged table would silently drop the
          intervening commits.
        """
        found = self._find_staged(wap_id, snapshot_id)
        version = self.current_version()
        meta = self.metadata(version)
        # operate on THIS metadata load's log entry (not _find_staged's
        # separate load) so the staged→published flip is actually written
        s = next(x for x in meta.snapshots if x.snapshot_id == found.snapshot_id)
        if s.parent_snapshot_id == meta.current_snapshot_id:
            s.summary.pop("staged", None)
            meta.current_snapshot_id = s.snapshot_id
            self._write_metadata_version(version + 1, meta)
            return s
        if s.operation != "append":
            raise ValueError(
                f"staged {s.operation!r} snapshot {s.snapshot_id} no longer "
                f"sits on the current snapshot — only appends can be "
                f"cherry-picked across commits"
            )
        added = self._own_delta_pdf(s)
        # persist the staged→published flip first; the cherry-pick commit
        # below re-reads metadata, so the flip must already be on disk
        s.summary.pop("staged", None)
        self._write_metadata_version(version + 1, meta)
        return self.commit(
            "append",
            added,
            summary={
                "stage": "publish",
                "cherrypicked_from": s.snapshot_id,
                "wap.id": s.summary.get("wap.id", ""),
            },
        )

    # ---------- write paths ----------

    def new_data_prefix(self) -> str:
        """Fresh isolated directory for one commit's data files."""
        prefix = os.path.join(self.data_dir, uuid.uuid4().hex[:16])
        os.makedirs(prefix, exist_ok=False)
        return prefix

    def data_writer(self, df: DataFrame):
        """``df.write.mode("append")`` carrying the table's parquet write
        properties (footer bloom filters, see ``bloom_write_options``).
        Every DATA-file write path — ingest, compact, cluster, merge
        keep/delta, delete rewrite — goes through this so rewrites never
        silently drop the blooms; positional/equality DELETE files and
        manifests skip it (their columns aren't table columns)."""
        cons = self.constraints()
        for cname in sorted(cons):
            # row-level enforcement INSIDE the write job (no extra pass):
            # assert_true inside a filter cannot be pruned away, unlike a
            # dropped projection column; NULL conditions pass (SQL CHECK)
            ok = F.coalesce(F.expr(cons[cname]), F.lit(True))
            df = df.filter(
                F.assert_true(
                    ok, f"CHECK constraint {cname} ({cons[cname]}) violated"
                ).isNull()
            )
        w = df.write.mode("append")
        opts = bloom_write_options(self.metadata())
        return w.options(**opts) if opts else w

    def append(
        self,
        df: DataFrame,
        *,
        merge_schema: bool = False,
        summary: Optional[dict] = None,
    ) -> Snapshot:
        """Schema-checked append: columns are matched BY NAME against the
        declared schema and cast to the declared types; columns the frame
        lacks land as NULL (they read back as their declared DEFAULT if
        one is set). A frame carrying UNDECLARED columns raises — unless
        ``merge_schema=True`` (Delta's ``mergeSchema``/autoMerge), which
        first ADDS the new columns as a metadata-only schema evolution
        typed from the frame, then appends. The raw ``write_files`` +
        ``commit`` path stays available for internal operators that
        guarantee their own schema."""
        from pyspark.sql.types import StructType

        declared = StructType.fromDDL(self.metadata().schema_ddl)
        names = {f.name for f in declared.fields}
        extra = [f for f in df.schema.fields if f.name not in names]
        if extra:
            if not merge_schema:
                raise ValueError(
                    f"frame has columns not in the table schema: "
                    f"{[f.name for f in extra]} (pass merge_schema=True "
                    f"to evolve the schema)"
                )
            self.add_columns(
                ", ".join(
                    f"{f.name} {f.dataType.simpleString()}" for f in extra
                )
            )
            declared = StructType.fromDDL(self.metadata().schema_ddl)
        out = df.select(
            *[
                (
                    F.col(f.name) if f.name in df.columns else F.lit(None)
                ).cast(f.dataType).alias(f.name)
                for f in declared.fields
            ]
        )
        entries = self.write_files(out)
        n = int(entries["record_count"].sum()) if len(entries) else 0
        summ = {"stage": "append", "rows_inserted": n}
        summ.update(summary or {})
        return self.commit("append", entries, summ)

    def write_files(self, df: DataFrame) -> pd.DataFrame:
        """Write df's current partitioning into a fresh commit dir; return
        manifest entries (with stats) for the files written.

        By default respects the DataFrame's existing partitioning —
        callers ``repartitionByRange(n, *partition_cols, sort_key)`` for
        partition-homogeneous, size-targeted files. The Iceberg
        ``write.distribution-mode`` table property overrides that for
        plain appends: ``hash`` shuffles rows onto their partition tuple
        (partition-homogeneous files — no writer holds every partition's
        files open at 10^12-row ingest widths), ``range`` additionally
        range-orders by the declared ``sort.order`` curve and sorts
        within files, so fresh ingest lands pre-clustered and the
        nightly cluster run has less dirty data. ``none`` (default) is
        the current behavior. Width = ``spark.sql.shuffle.partitions``.
        Internal rewrite operators (compact/cluster/merge) plan their
        own distribution and do NOT route through this.
        """
        mode = str(
            self.metadata().properties.get("write.distribution-mode", "none")
        ).lower()
        if mode not in ("none", "hash", "range"):
            raise ValueError(
                f"write.distribution-mode must be none|hash|range, got {mode!r}"
            )
        if mode != "none":
            meta = self.metadata()
            spark = df.sparkSession
            n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            pexprs = [
                t.expr() for t in transforms.parse_spec(meta.partition_cols)
            ]
            if mode == "hash":
                df = df.repartition(n, *pexprs) if pexprs else df
            else:  # range
                keys = list(pexprs)
                prop = str(meta.properties.get("sort.order", "") or "")
                pm = re.match(
                    r"(morton|hilbert|zorder)\(([^)]+)\)$", prop.strip()
                )
                if pm and pm.group(1) in ("morton", "zorder"):
                    from ..functions.udfs import morton64_expr

                    cs = [c.strip() for c in pm.group(2).split(",")]
                    keys.append(morton64_expr(*[F.col(c) for c in cs[:3]]))
                elif prop and not pm:
                    # linear Iceberg sort order: plain column list
                    keys += [
                        F.col(c.strip())
                        for c in prop.split(",")
                        if c.strip()
                    ]
                if keys:
                    df = df.repartitionByRange(n, *keys).sortWithinPartitions(
                        *keys
                    )
        prefix = self.new_data_prefix()
        self.data_writer(df).parquet(prefix)
        return self.collect_stats_for_prefix(df.sparkSession, prefix)

    def add_files(
        self,
        spark: SparkSession,
        source,
        branch: Optional[str] = None,
    ) -> Snapshot:
        """Import EXISTING parquet files into the table without rewriting
        them (Iceberg's ``add_files`` migration procedure): the files are
        hard-linked (copy fallback across filesystems) into a fresh commit
        prefix — zero payload decode/encode — then one column-pruned Spark
        aggregation collects per-file stats and an append commit registers
        them. The originals are left untouched; the lakehouse adopts a
        plain-parquet dataset in O(stats scan), not O(rewrite).

        ``source``: a directory containing ``*.parquet`` or an explicit
        list of parquet file paths. Schema is validated against the table
        (same column-name set, read from the first file's FOOTER — no data
        read); a mismatch raises before anything is linked.
        """
        import shutil

        if isinstance(source, str):
            paths = sorted(
                os.path.join(source, fn)
                for fn in os.listdir(source)
                if fn.endswith(".parquet")
            )
        else:
            paths = list(source)
        if not paths:
            raise ValueError("add_files: no parquet files in source")
        file_cols = {f.name for f in pq.ParquetFile(paths[0]).schema_arrow}
        table_cols = {f.name for f in self._schema(spark).fields}
        if file_cols != table_cols:
            raise ValueError(
                f"add_files: schema mismatch — file columns {sorted(file_cols)} "
                f"vs table columns {sorted(table_cols)}"
            )
        prefix = self.new_data_prefix()
        for p in paths:
            dst = os.path.join(prefix, os.path.basename(p))
            try:
                os.link(p, dst)
            except OSError:
                shutil.copy2(p, dst)
        entries = self.collect_stats_for_prefix(spark, prefix)
        return self.commit(
            "append",
            entries,
            summary={
                "stage": "add_files",
                "source_files": len(paths),
            },
            branch=branch,
        )

    def clone(
        self,
        dest_root: str,
        snapshot_id: Optional[int] = None,
    ) -> "Table":
        """Zero-copy SHALLOW CLONE (Delta's ``CREATE TABLE … SHALLOW
        CLONE`` analogue): a new INDEPENDENT table whose initial snapshot
        holds this table's file set at ``snapshot_id`` (default:
        current). Data files are hard-linked (copy fallback across
        filesystems) and the source's manifest entries are reused
        verbatim — no Spark job, no stats recollection, no payload read:
        the whole clone is O(files) driver metadata work. Afterwards the
        two tables evolve independently: commits, maintenance and expiry
        on either side never touch the other (hard links keep bytes
        alive until BOTH sides' GC has dropped them).

        Cloning a snapshot with pending merge-on-read deletes is refused
        — reusing its data files verbatim would resurrect suppressed
        rows in the clone; run ``apply_deletes()`` first.
        """
        import shutil

        s = self.snapshot(snapshot_id)
        if s.delete_paths or s.eq_deletes:
            raise ValueError(
                "snapshot has pending merge-on-read deletes; run "
                "apply_deletes() before cloning"
            )
        meta = self.metadata()
        props = {
            k: v
            for k, v in meta.properties.items()
            if not k.startswith(("ref.", "branch.", "stream.txn."))
        }
        dest = Table.create(
            dest_root,
            meta.schema_ddl,
            partition_cols=list(meta.partition_cols),
            stats_cols=list(meta.stats_cols),
            properties=props or None,
        )
        man = self.manifest_pdf(s.snapshot_id)
        if len(man):
            prefix = dest.new_data_prefix()
            new_paths = []
            for i, rel in enumerate(man["path"]):
                src = os.path.join(self.root, rel)
                dst = os.path.join(prefix, f"{i:08d}-{os.path.basename(rel)}")
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
                new_paths.append(os.path.relpath(dst, dest.root))
            man = man.copy()
            man["path"] = new_paths
        dest.commit(
            "append",
            man,
            summary={
                "stage": "clone",
                "source_table_uuid": meta.table_uuid,
                "source_snapshot_id": int(s.snapshot_id),
                "files_linked": int(len(man)),
            },
        )
        return dest

    def collect_stats_for_prefix(
        self, spark: SparkSession, prefix, method: str = "auto"
    ) -> pd.DataFrame:
        """Per-file min/max/null stats for freshly written data files.

        Two collectors, identical output (asserted equal in
        tests/test_tableformat.py):

        - **footer** (default): harvest the parquet FOOTER statistics the
          writer already computed — per-row-group min/max/null-count —
          and fold them per file. ZERO data IO: a footer read per file
          instead of re-scanning every payload byte, which at 100 TB is
          the difference between a metadata operation and a second full
          read of everything just written (Iceberg's metrics/migration
          path works the same way). Non-identity partition-transform
          stats are derived from the source column's bounds — sound
          because every transform except ``bucket`` is monotonic. Footer
          reads distribute over executors above a path-count threshold,
          else a driver thread pool (IO-bound, GIL-released).
        - **scan** (fallback; ``method="scan"`` forces it): one Spark agg
          grouped by ``_metadata.file_path`` over the data itself — the
          universal path, used when a footer can't prove exact stats
          (missing min/max, truncation-length string bounds, float NaN,
          INT96 timestamps) or the spec has a ``bucket`` transform. This
          is the north_star's 'per-file min/max column stats' collector;
          it scales with executors, unlike the reference's per-column
          ``filter().count()`` loop
          (/root/reference/scripts/gold_agilean.py:117-122).
        """
        meta = self.metadata()
        prefixes = [prefix] if isinstance(prefix, str) else list(prefix)
        tforms = transforms.parse_spec(meta.partition_cols)
        part_fields = [t.name for t in tforms]
        if method != "scan" and all(t.monotonic for t in tforms):
            pdf = self._footer_stats(spark, prefixes, meta, tforms)
            if pdf is not None:
                return self._stats_tail(pdf, part_fields)
            if method == "footer":
                raise ValueError(
                    "footer stats unavailable or inexact for these files"
                )
        df = spark.read.parquet(*prefixes)
        # hidden partitioning: materialize each non-identity transform as a
        # derived column so its min/max/null stats (and partition_json
        # routing) use the TRANSFORM value — users' predicates on the
        # source column are mapped into this space at scan time
        for t in tforms:
            if t.kind != "identity":
                df = df.withColumn(t.name, t.expr())
        stat_cols = list(dict.fromkeys(part_fields + list(meta.stats_cols)))
        aggs = [
            F.count(F.lit(1)).alias("record_count"),
            F.first(F.col("_metadata.file_size")).alias("file_size_bytes"),
        ]
        for c in stat_cols:
            aggs += [
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
            ]
        agg_df = df.groupBy(F.col("_metadata.file_path").alias("abs_path")).agg(*aggs)
        return self._stats_tail(agg_df.toArrow(), part_fields)

    def _footer_stats(
        self, spark: SparkSession, prefixes, meta, tforms
    ) -> Optional[pa.Table]:
        """Fold parquet footer statistics into manifest entries; None when
        any file's footer can't prove exact stats (caller falls back to
        the data-scan collector)."""
        want = list(
            dict.fromkeys([t.source for t in tforms] + list(meta.stats_cols))
        )
        paths = []
        for pre in prefixes:
            pre = _strip_scheme(pre)
            if not os.path.isdir(pre):
                return None  # non-local filesystem: use the scan collector
            for dirpath, _dirs, files in os.walk(pre):
                paths += [
                    os.path.join(dirpath, fn)
                    for fn in sorted(files)
                    if fn.endswith(".parquet")
                ]
        if not paths:
            return None
        if len(paths) > FOOTER_SPARK_THRESHOLD:
            # metadata fan-out over executors: ~10^8 files is a big job of
            # tiny tasks, never a driver loop
            rows = (
                spark.sparkContext.parallelize(
                    paths, max(1, len(paths) // 64)
                )
                .map(lambda p: _footer_file_stats(p, want))
                .collect()
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(32, max(4, len(paths)))
            ) as ex:
                rows = list(ex.map(lambda p: _footer_file_stats(p, want), paths))
        if any(r is None for r in rows):
            return None
        # zero-row files contribute no manifest entry (matches the scan
        # collector: no rows -> no group for that file)
        pairs = [(p, r) for p, r in zip(paths, rows) if r["n"] > 0]
        paths = [p for p, _ in pairs]
        rows = [r for _, r in pairs]
        types = _ddl_arrow_types(meta.schema_ddl)
        tf_type = {
            "truncate": pa.string(),
            "days": pa.int32(),
            "months": pa.int32(),
            "years": pa.int32(),
        }
        name_to_tf = {t.name: t for t in tforms}
        part_fields = [t.name for t in tforms]
        out_cols = list(dict.fromkeys(part_fields + list(meta.stats_cols)))
        arrays = {
            "abs_path": pa.array(paths, pa.string()),
            "record_count": pa.array([r["n"] for r in rows], pa.int64()),
            "file_size_bytes": pa.array([r["size"] for r in rows], pa.int64()),
        }
        names = ["abs_path", "record_count", "file_size_bytes"]
        for c in out_cols:
            t = name_to_tf.get(c)
            if t is not None and t.kind != "identity":
                src, typ = t.source, tf_type[t.kind]
                mns = [t.py_value(r["cols"][src][0]) for r in rows]
                mxs = [t.py_value(r["cols"][src][1]) for r in rows]
            else:
                src, typ = c, types.get(c, pa.string())
                mns = [r["cols"][src][0] for r in rows]
                mxs = [r["cols"][src][1] for r in rows]
            try:
                arrays[f"min_{c}"] = pa.array(mns, typ)
                arrays[f"max_{c}"] = pa.array(mxs, typ)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                return None  # footer value shape unexpected: scan instead
            arrays[f"nulls_{c}"] = pa.array(
                [r["cols"][src][2] for r in rows], pa.int64()
            )
            names += [f"min_{c}", f"max_{c}", f"nulls_{c}"]
        return pa.table({n: arrays[n] for n in names})

    def _stats_tail(self, atbl: pa.Table, part_fields) -> pd.DataFrame:
        # via Arrow, NOT toPandas: pandas coerces a nullable int64 column
        # that happens to be all-null in this batch to float64, which (a)
        # breaks the mergeSchema manifest read against sibling int64
        # manifests and (b) rounds >2^53 values (phash!) — unsound stats.
        # Integer columns with nulls become pandas Int64 (exact).
        pdf = atbl.to_pandas()
        for f_ in atbl.schema:
            if pa.types.is_integer(f_.type) and pdf[f_.name].dtype.kind == "f":
                pdf[f_.name] = pd.Series(
                    atbl[f_.name].to_pylist(), index=pdf.index, dtype="Int64"
                )
        # A file "belongs" to a partition value iff min == max on every
        # partition column; boundary files from range partitioning are
        # tagged mixed and handled (rewritten) by compaction. Vectorized:
        # an iterrows() loop here is O(files) of slow driver python —
        # pandas stays the planner only below SPARK_MANIFEST_THRESHOLD,
        # but 2M rows of iterrows is minutes while this is milliseconds.
        cols_json = []
        for c in sorted(part_fields):
            v = pdf[f"min_{c}"].astype(str).where(
                pdf[f"min_{c}"] == pdf[f"max_{c}"], "__mixed__"
            )
            cols_json.append(json.dumps(c) + ": " + v.map(json.dumps))
        if cols_json:
            body = cols_json[0]
            for part in cols_json[1:]:
                body = body + ", " + part
            pdf["partition_json"] = "{" + body + "}"
        else:
            pdf["partition_json"] = "{}"
        pdf["path"] = [os.path.relpath(_strip_scheme(p), self.root) for p in pdf["abs_path"]]
        return pdf.drop(columns=["abs_path"])

    # ---------- read path ----------

    def scan(
        self,
        spark: SparkSession,
        snapshot_id: Optional[int] = None,
        predicates: Optional[Iterable[tuple]] = None,
        columns: Optional[Sequence[str]] = None,
        as_of_ms: Optional[int] = None,
        branch: Optional[str] = None,
    ) -> DataFrame:
        """Snapshot read with manifest min/max file pruning.

        ``predicates``: iterable of ``(col, op, value)`` with op in
        ``>= <= = between in isnull notnull`` (value is a (lo, hi) pair
        for between, a list of values for in — batch point lookups that
        compose with manifest pruning, bucket-transform derivation and
        the parquet footer blooms; value is ignored for isnull/notnull,
        which prune on the per-file null-count stats). Files
        whose [min,max] range provably excludes the predicate are skipped
        before Spark ever lists them; the same predicate is re-applied as a
        real filter for row-level correctness (pruning is only file-level).
        ``as_of_ms``: time travel — read the latest snapshot committed at
        or before this timestamp (mutually exclusive with snapshot_id).
        ``branch``: read the named branch's head (mutually exclusive with
        both).
        """
        if branch is not None:
            if snapshot_id is not None or as_of_ms is not None:
                raise ValueError("branch is exclusive with snapshot_id/as_of_ms")
            snapshot_id = self.branch_head(branch)
        if as_of_ms is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or as_of_ms, not both")
            snapshot_id = self.snapshot_as_of(as_of_ms).snapshot_id
        meta = self.metadata()
        if snapshot_id is None and meta.current_snapshot_id is None:
            # freshly created table (no snapshot yet): a zero-row relation
            # with the declared schema — Iceberg's CREATE-then-SELECT shape
            empty = self.empty_relation(spark, meta.schema_ddl)
            return empty.select(*columns) if columns else empty
        preds = list(predicates or [])
        # hidden partitioning: file-level pruning additionally uses the
        # transform-space predicates derived from source-column predicates
        # (sound by construction); ROW-level filtering below re-applies
        # only the originals
        prune_preds = transforms.extend_predicates(meta.partition_cols, preds)
        statable = statable_cols(meta)
        # planner path picked by manifest size WITHOUT materializing it: the
        # parquet footer gives the row count. Below the threshold pandas
        # plans driver-side (no job overhead); above it the same pruning
        # predicate runs as a Spark job over the manifest parquet and
        # only surviving paths come back to the driver.
        s = self.snapshot(snapshot_id)

        def _empty():
            e = self.empty_relation(spark, meta.schema_ddl)
            return e.select(*columns) if columns else e

        n_entries = self.manifest_rows(s.snapshot_id)
        if n_entries == 0:
            return _empty()
        if n_entries > SPARK_MANIFEST_THRESHOLD:
            rel_paths = prune_manifest_spark(
                self.manifest_df(spark, s.snapshot_id), prune_preds, statable
            )
        else:
            man = self.manifest_pdf(snapshot_id)
            rel_paths = list(prune_manifest(man, prune_preds, statable)["path"])
        if len(rel_paths) == 0:
            return _empty()
        paths = [os.path.join(self.root, p) for p in rel_paths]
        df = self.read_data(spark, paths, meta=meta)
        if s.eq_deletes:
            # equality deletes need a file-path column that survives the
            # positional anti-join; compute it once on the raw relation
            df = self._apply_mor_deletes(spark, df, s, keep_pos_cols=True)
            df = self._apply_eq_deletes(spark, df, s, path_col="__mor_path")
            df = df.drop("__mor_path", "__mor_pos")
        else:
            df = self._apply_mor_deletes(spark, df, s)
        for col, op, value in preds:
            df = df.filter(_pred_to_column(col, op, value))
        if columns:
            df = df.select(*columns)
        return df

    def pending_delete_paths(self, snapshot_id: Optional[int] = None) -> list:
        """Merge-on-read delete files pending at a snapshot (relative
        paths); empty when the table has none (the common case — every
        read and rewrite path is then exactly as before)."""
        if self.metadata().current_snapshot_id is None and snapshot_id is None:
            return []
        return list(self.snapshot(snapshot_id).delete_paths)

    def pending_eq_deletes(self, snapshot_id: Optional[int] = None) -> list:
        """Merge-on-read EQUALITY deletes pending at a snapshot: a list of
        ``{"path", "cols", "as_of_snapshot_id"}`` dicts (empty in the
        common case)."""
        if self.metadata().current_snapshot_id is None and snapshot_id is None:
            return []
        return [dict(e) for e in self.snapshot(snapshot_id).eq_deletes]

    def _apply_eq_deletes(
        self, spark, df: DataFrame, s: Snapshot, path_col: Optional[str] = None
    ) -> DataFrame:
        """Anti-join out equality-deleted rows (Iceberg v2 equality delete
        semantics with sequence ordering): a value row in an equality
        delete file suppresses every data row matching it on the delete's
        columns, in data files that existed at the delete's
        ``as_of_snapshot_id`` — files appended LATER are exempt, so a
        re-insert of a deleted key survives, exactly like Iceberg's
        sequence-number rule. Zero-cost when no equality deletes are
        pending. Value sets are small by design (targeted key deletes —
        bulk predicates should use copy-on-write), so the anti-join
        broadcasts; the exempt file set is the files APPENDED since the
        delete, small while the delete is pending (rewrites are guarded),
        and joins as a broadcast path-marker."""
        if not s.eq_deletes:
            return df
        from collections import defaultdict

        groups: dict = defaultdict(list)
        for e in s.eq_deletes:
            groups[(tuple(e["cols"]), int(e["as_of_snapshot_id"]))].append(e["path"])
        cur_paths = set(self.manifest_pdf(s.snapshot_id)["path"])
        # ``_metadata`` resolves only on the raw file relation — callers
        # that already projected it away (e.g. through the positional
        # anti-join) pass the name of their retained path column instead
        own_path = path_col is None
        pc = "__eq_path" if own_path else path_col
        out = (
            df.withColumn("__eq_path", rel_path_expr(self.root)) if own_path else df
        )
        for (cols, as_of), dpaths in sorted(groups.items(), key=lambda kv: kv[0][1]):
            vals = (
                spark.read.parquet(*[os.path.join(self.root, p) for p in dpaths])
                .select(*cols)
                .distinct()
                .withColumn("__eq_hit", F.lit(True))
            )
            covered = set(self.manifest_pdf(as_of)["path"])
            exempt = sorted(cur_paths - covered)
            out = out.join(F.broadcast(vals), list(cols), "left")
            if exempt:
                ex = (
                    spark.createDataFrame(
                        [(p,) for p in exempt], f"{pc} string"
                    ).withColumn("__eq_ex", F.lit(True))
                )
                out = (
                    out.join(F.broadcast(ex), pc, "left")
                    .filter(
                        F.col("__eq_hit").isNull() | F.col("__eq_ex").isNotNull()
                    )
                    .drop("__eq_hit", "__eq_ex")
                )
            else:
                out = out.filter(F.col("__eq_hit").isNull()).drop("__eq_hit")
        return out.drop("__eq_path") if own_path else out

    def _apply_mor_deletes(
        self, spark, df: DataFrame, s: Snapshot, keep_pos_cols: bool = False
    ) -> DataFrame:
        """Anti-join out positionally-deleted rows (Iceberg v2 positional
        delete semantics: a delete file row (path, pos) suppresses row
        ``pos`` of data file ``path``). Zero-cost when no deletes are
        pending. Delete sets are small by design (sparse deletes — bulk
        deletes should use copy-on-write), so the anti-join broadcasts;
        a large accumulated set falls back to a shuffle join and is the
        signal to run ``apply_deletes``."""
        if not s.delete_paths:
            if keep_pos_cols:
                return df.withColumn(
                    "__mor_path", rel_path_expr(self.root)
                ).withColumn("__mor_pos", F.col("_metadata.row_index"))
            return df
        dabs = [os.path.join(self.root, p) for p in s.delete_paths]
        dels = spark.read.schema("path string, pos long").parquet(*dabs)
        nbytes = sum(os.path.getsize(p) for p in dabs if os.path.exists(p))
        if nbytes <= 64 * 1024 * 1024:
            dels = F.broadcast(dels)
        out = (
            df.withColumn("__mor_path", rel_path_expr(self.root))
            .withColumn("__mor_pos", F.col("_metadata.row_index"))
            .join(
                dels.withColumnRenamed("path", "__mor_path").withColumnRenamed(
                    "pos", "__mor_pos"
                ),
                ["__mor_path", "__mor_pos"],
                "left_anti",
            )
        )
        return out if keep_pos_cols else out.drop("__mor_path", "__mor_pos")

    def changes(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: Optional[int] = None,
        columns: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        """Incremental scan: rows LOGICALLY ADDED after ``from_snapshot_id``
        up to ``to_snapshot_id`` (inclusive; default current) — the
        snapshot-diff consumption pattern the reference approximates with
        Glue job bookmarks (/root/reference/terraform/glue_digit.tf:14,
        SURVEY.md §2.9 T5), planned from manifest diffs instead of
        directory listing.

        Per-snapshot semantics (Iceberg incremental-read rules):

        - ``append``  → all files new to that snapshot's manifest.
        - ``merge``   → only the delta files (the upserted source rows;
          the snapshot summary records their prefix). Keep-side rewrites
          carry no new logical rows.
        - ``replace`` / ``expire`` → physical reorganization only; no
          logical change, nothing emitted.

        A consumer that checkpoints the last snapshot id it processed and
        reads ``changes(last, current)`` sees every appended/upserted row
        exactly once.
        """
        chain = self._ancestry_chain(from_snapshot_id, to_snapshot_id)
        meta = self.metadata()
        # planner path, like scan(): driver-side python sets are O(manifest)
        # memory per snapshot; above the threshold the added-file diff runs
        # as a Spark anti-join per chain link and only the ADDED paths (the
        # actual incremental payload, retention-bounded) reach the driver
        use_spark = self.manifest_rows(from_snapshot_id) > SPARK_MANIFEST_THRESHOLD
        new_paths: list = []
        if use_spark:
            prev_man = self.manifest_df(spark, from_snapshot_id).select("path")
            for s in chain:
                cur_man = self.manifest_df(spark, s.snapshot_id).select("path")
                if s.operation in ("append", "merge", "update", "overwrite"):
                    added_df = cur_man.join(prev_man, "path", "left_anti")
                    if s.operation in ("merge", "update"):
                        delta_prefix = s.summary.get("delta_prefix")
                        added_df = (
                            added_df.filter(
                                F.col("path").startswith(delta_prefix)
                            )
                            if delta_prefix
                            else added_df.limit(0)
                        )
                    elif s.operation == "overwrite":
                        # only the landed frame's files are logical
                        # inserts; boundary-file keep-rewrites carry
                        # PRE-EXISTING rows and must not re-emit
                        ip = s.summary.get("insert_prefix")
                        if ip:
                            added_df = added_df.filter(
                                F.col("path").startswith(ip)
                            )
                    new_paths += sorted(r["path"] for r in added_df.collect())
                # replace / expire: physical-only, nothing emitted
                prev_man = cur_man
        else:
            prev_paths = set(self.manifest_pdf(from_snapshot_id)["path"])
            for s in chain:
                cur_paths = set(self.manifest_pdf(s.snapshot_id)["path"])
                added = cur_paths - prev_paths
                if s.operation == "append":
                    new_paths += sorted(added)
                elif s.operation == "overwrite":
                    # the landed frame's files (insert_prefix) are the
                    # logical payload; boundary keep-rewrites carry
                    # pre-existing rows; removals surface in changes_cdc
                    ip = s.summary.get("insert_prefix")
                    new_paths += sorted(
                        p for p in added if not ip or p.startswith(ip)
                    )
                elif s.operation in ("merge", "update"):
                    delta_prefix = s.summary.get("delta_prefix")
                    if delta_prefix:
                        new_paths += sorted(
                            p for p in added if p.startswith(delta_prefix)
                        )
                # replace / expire: physical-only, nothing emitted
                prev_paths = cur_paths
        if not new_paths:
            e = self.empty_relation(spark, meta.schema_ddl)
            return e.select(*columns) if columns else e
        df = self.read_data(
            spark, [os.path.join(self.root, p) for p in new_paths]
        )
        if columns:
            df = df.select(*columns)
        return df

    def _ancestry_chain(self, from_snapshot_id: int, to_snapshot_id: Optional[int]):
        """Published-snapshot chain (exclusive of ``from``, inclusive of
        ``to``), oldest first. Ancestry walk (parent pointers), not an
        id-range scan: staged WAP snapshots and rollback branches put
        off-chain ids inside [from, to] — those carry no published rows
        and must be skipped, while a genuinely pruned ancestor must
        still fail loudly."""
        meta = self.metadata()
        to_sid = (
            to_snapshot_id if to_snapshot_id is not None else meta.current_snapshot_id
        )
        if to_sid is None or to_sid < from_snapshot_id:
            raise ValueError(f"bad snapshot range [{from_snapshot_id}, {to_sid}]")
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        chain: list = []
        sid = to_sid
        while sid != from_snapshot_id:
            s = by_id.get(sid)
            if s is None or s.parent_snapshot_id is None:
                raise KeyError(
                    f"snapshot {from_snapshot_id} is not a live ancestor of "
                    f"{to_sid}: an intermediate snapshot expired (incremental "
                    f"consumers must keep up with the expiry retention "
                    f"window) or the table was rolled back across it"
                )
            chain.append(s)
            sid = s.parent_snapshot_id
        chain.reverse()
        try:
            self.snapshot(from_snapshot_id)
        except KeyError as e:
            raise KeyError(
                f"snapshot {from_snapshot_id} expired — incremental "
                f"consumers must keep up with the expiry retention window"
            ) from e
        return chain

    def changes_cdc(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: Optional[int] = None,
        key_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        """CDC changelog between two snapshots: every ROW-LEVEL change as
        table columns + ``_change_type`` ('insert' | 'delete') +
        ``_commit_snapshot_id`` — the Iceberg ``create_changelog_view`` /
        Delta Change Data Feed surface. ``changes()`` answers "what rows
        are new"; this answers "what happened", including removals — the
        feed an incremental training-data consumer needs to retract
        examples it already exported (an update arrives as a delete of
        the old version + an insert of the new, Iceberg changelog style).

        ``key_cols`` (Iceberg changelog compute-updates mode): when given,
        a delete and an insert in the SAME commit sharing a key tuple are
        re-tagged ``update_preimage`` / ``update_postimage`` — a MERGE's
        caption rewrite then reads as an update of that image_id rather
        than an unrelated remove + add. Pairing is uniform across write
        modes: a merge-on-read MERGE/UPDATE's delta inserts pair with its
        positional-delete suppressions the same way a copy-on-write
        commit's file-diff surpluses do.

        Per-snapshot derivation (all bounded by the commit's TOUCHED
        files, never the table):

        - ``append`` → added files read directly as inserts.
        - ``merge`` / copy-on-write ``delete`` → a MULTISET diff of the
          removed vs added files' rows: copy-on-write copies surviving
          rows unchanged, so they cancel; deleted/old-version rows
          survive on the removed side, upserted rows on the added side.
          Row identity is ``xxhash64`` over all columns (count-aware, so
          duplicate identical rows emit the right multiplicity).
        - merge-on-read ``delete`` (positional) → the NEW delete files'
          (path, pos) entries semi-joined against the parent-visible
          rows of those files.
        - merge-on-read ``delete`` (equality) → the NEW value files
          semi-joined against the parent-visible scan (the delete's
          as-of IS the parent, so covered-file filtering is implicit).
        - ``replace`` / ``expire`` (compaction, clustering,
          rewrite_manifests, apply_deletes, delete-file compaction) →
          physical only, nothing emitted.

        Rewritten-away files stay on disk until ``expire_snapshots`` GC,
        which is what makes the removed side readable — the same
        retention window ``changes()`` already requires of consumers.
        """
        chain = self._ancestry_chain(from_snapshot_id, to_snapshot_id)
        schema = self._schema(spark)
        cols = [f.name for f in schema.fields]

        def _read(rel_paths):
            return self.read_data(
                spark, [os.path.join(self.root, p) for p in rel_paths]
            )

        def _tag(df, kind, s):
            return df.select(
                *cols,
                F.lit(kind).alias("_change_type"),
                F.lit(s.snapshot_id).cast("long").alias("_commit_snapshot_id"),
            )

        def _counted(df):
            return df.groupBy(
                F.xxhash64(*[F.col(c) for c in cols]).alias("__sig")
            ).agg(
                F.count(F.lit(1)).alias("__n"),
                F.first(F.struct(*cols)).alias("__r"),
            )

        def _surplus(a, b):
            """Rows of ``a`` beyond their multiplicity in ``b``."""
            return (
                _counted(a)
                .join(
                    _counted(b).select("__sig", F.col("__n").alias("__nb")),
                    "__sig",
                    "left",
                )
                .withColumn("__d", F.col("__n") - F.coalesce("__nb", F.lit(0)))
                .filter(F.col("__d") > 0)
                .select("__r", F.explode(F.expr("sequence(1, __d)")))
                .select("__r.*")
            )

        def _pair(ins, dels, s):
            """Tag ONE commit's insert-side and delete-side rows; with
            ``key_cols``, a same-commit delete+insert sharing a key tuple
            is re-tagged as an update pre/post image. Applies uniformly:
            a copy-on-write commit's multiset-diff surpluses and a
            merge-on-read commit's delta-insert + positional-delete feed
            pair the same way (Iceberg changelog compute-updates)."""
            if not key_cols:
                return [_tag(ins, "insert", s), _tag(dels, "delete", s)]
            kc = list(key_cols)
            ik, dk = (d.select(*kc).distinct() for d in (ins, dels))
            return [
                _tag(ins.join(dk, kc, "left_anti"), "insert", s),
                _tag(ins.join(dk, kc, "left_semi"), "update_postimage", s),
                _tag(dels.join(ik, kc, "left_anti"), "delete", s),
                _tag(dels.join(ik, kc, "left_semi"), "update_preimage", s),
            ]

        parts = []
        prev = self.snapshot(from_snapshot_id)
        # planner path, like scan()/changes(): below the manifest threshold
        # the per-link file diff is a driver-side set difference; above it
        # the diff runs as Spark anti-joins and only the TOUCHED paths (the
        # commit's actual footprint, never the table) reach the driver.
        # Physical-only links (replace/expire) skip the diff entirely.
        use_spark = self.manifest_rows(from_snapshot_id) > SPARK_MANIFEST_THRESHOLD
        prev_paths = (
            None if use_spark else set(self.manifest_pdf(from_snapshot_id)["path"])
        )
        prev_man = (
            self.manifest_df(spark, from_snapshot_id).select("path")
            if use_spark
            else None
        )
        for s in chain:
            logical = s.operation in (
                "append", "merge", "delete", "update", "overwrite"
            )
            if use_spark:
                cur_man = self.manifest_df(spark, s.snapshot_id).select("path")
                added = removed = []
                if logical:
                    added = sorted(
                        r["path"]
                        for r in cur_man.join(prev_man, "path", "left_anti").collect()
                    )
                    if s.operation != "append":
                        removed = sorted(
                            r["path"]
                            for r in prev_man.join(
                                cur_man, "path", "left_anti"
                            ).collect()
                        )
                prev_man = cur_man
            else:
                cur_paths = set(self.manifest_pdf(s.snapshot_id)["path"])
                added = sorted(cur_paths - prev_paths) if logical else []
                removed = sorted(prev_paths - cur_paths) if logical else []
                prev_paths = cur_paths
            ins_side = None
            dels_side = None
            if s.operation == "append":
                if added:
                    ins_side = _read(added)
            elif s.operation in ("merge", "delete", "update", "overwrite") and (
                added or removed
            ):
                old = _read(removed) if removed else _read(added).limit(0)
                new = _read(added) if added else old.limit(0)
                ins_side, dels_side = _surplus(new, old), _surplus(old, new)
            # merge-on-read commits: the manifest is unchanged (or grew by
            # a delta append); the pending delete sets grew vs the parent
            new_dp = sorted(set(s.delete_paths) - set(prev.delete_paths))
            if new_dp:
                dels = spark.read.schema("path string, pos long").parquet(
                    *[os.path.join(self.root, p) for p in new_dp]
                )
                # the delete entries name exactly the touched data files —
                # read only those, never the parent's whole file set
                touched = sorted(
                    r["path"] for r in dels.select("path").distinct().collect()
                )
                base = _read(touched)
                base = self._apply_mor_deletes(spark, base, prev, keep_pos_cols=True)
                base = self._apply_eq_deletes(spark, base, prev, path_col="__mor_path")
                hit = base.join(
                    F.broadcast(
                        dels.withColumnRenamed("path", "__mor_path").withColumnRenamed(
                            "pos", "__mor_pos"
                        )
                    ),
                    ["__mor_path", "__mor_pos"],
                    "left_semi",
                ).select(*cols)
                dels_side = hit if dels_side is None else dels_side.unionByName(hit)
            prev_eq = {e["path"] for e in prev.eq_deletes}
            new_eq = [e for e in s.eq_deletes if e["path"] not in prev_eq]
            if new_eq:
                base = self.scan(spark, snapshot_id=prev.snapshot_id)
                for e in new_eq:
                    vals = (
                        spark.read.parquet(os.path.join(self.root, e["path"]))
                        .select(*e["cols"])
                        .distinct()
                    )
                    hit = base.join(F.broadcast(vals), list(e["cols"]), "left_semi")
                    dels_side = (
                        hit if dels_side is None else dels_side.unionByName(hit)
                    )
            if ins_side is not None or dels_side is not None:
                empty = self.empty_relation(spark, schema)
                parts.extend(
                    _pair(
                        ins_side if ins_side is not None else empty,
                        dels_side if dels_side is not None else empty,
                        s,
                    )
                )
            prev = s
        if not parts:
            return _tag(
                self.empty_relation(spark, schema),
                "insert",
                chain[-1] if chain else self.snapshot(from_snapshot_id),
            ).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def register(
        self,
        spark: SparkSession,
        name: str,
        snapshot_id: Optional[int] = None,
        as_of_ms: Optional[int] = None,
    ) -> DataFrame:
        """Expose this table to ``spark.sql`` as a temp view (the Athena /
        SQL-analytics surface, SURVEY.md §2.1 S13 — the reference serves
        its gold layer exclusively through SQL,
        /root/reference/sql/athena_gold_queries.sql:8-95,
        /root/reference/terraform/athena.tf:7-53). The view pins the scan
        made at registration time (snapshot isolation carries over)."""
        df = self.scan(spark, snapshot_id=snapshot_id, as_of_ms=as_of_ms)
        df.createOrReplaceTempView(name)
        return df

    def _schema(self, spark: SparkSession):
        from pyspark.sql.types import StructType

        return StructType.fromDDL(self.metadata().schema_ddl)

    # ---------- maintenance helpers ----------

    def all_reachable_paths(self) -> set:
        """Data+manifest paths referenced by ANY retained snapshot."""
        meta = self.metadata()
        reach = set()
        for s in meta.snapshots:
            reach.update(s.delete_paths)  # MoR delete files live in data/
            reach.update(e["path"] for e in s.eq_deletes)
            for rel in s.manifest_paths:
                if rel in reach:  # manifest lists share ancestor manifests
                    continue
                reach.add(rel)
                man = pq.read_table(os.path.join(self.root, rel), columns=["path"])
                reach.update(man.column("path").to_pylist())
        return reach


from contextlib import contextmanager


@contextmanager
def read_split_size(spark: SparkSession, nbytes: int):
    """Align parquet read-split size with a maintenance stage's target
    file size for the duration of the stage.

    Why: ``spark.sql.files.maxPartitionBytes`` defaults to 128 MB, so a
    rewrite whose target_file_size is smaller (or a scan over a table of
    smaller files) bins many files into few read tasks — capping stage
    parallelism at total_bytes/128MB tasks regardless of executor count,
    and inflating copy-on-write outputs past the target (merge's keep
    path writes one file per READ SPLIT). Matching split size to target
    size keeps one task ≈ one output file and lets read-stage
    parallelism scale with the cluster instead of the constant 128 MB.

    Session-scoped by design: maintenance stages are single-driver and
    sequential (operators/run.py); concurrent TILE/BATCH jobs inside one
    stage all want the same split size, and the conf is restored on
    exit."""
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(nbytes)))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def rel_path_expr(root: str):
    """``_metadata.file_path`` (a file:-scheme URI) → path relative to the
    table root, computed JVM-side so joins/maps against manifest-stored
    relative paths use exactly matching strings."""
    import re as _re

    p = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
    return F.regexp_replace(p, "^" + _re.escape(root.rstrip("/") + "/"), "")


def _ddl_arrow_types(schema_ddl: str) -> dict:
    """{column: arrow type} from a Spark DDL string, driver-side (no
    session needed — commit() must stay pure-driver). Splits fields on
    depth-0 commas so decimal(10,2) / map<k,v> / struct<...> survive;
    unknown/nested types fall back to string (only used to type
    ALL-NULL stats columns, where any consistent type is sound as long
    as it matches the non-null manifests — nested types never collect
    min/max stats here)."""
    simple = {
        "string": pa.string(), "varchar": pa.string(), "char": pa.string(),
        "bigint": pa.int64(), "long": pa.int64(),
        "int": pa.int32(), "integer": pa.int32(),
        "smallint": pa.int16(), "tinyint": pa.int8(),
        "double": pa.float64(), "float": pa.float32(), "real": pa.float32(),
        "boolean": pa.bool_(), "binary": pa.binary(),
        "date": pa.date32(), "timestamp": pa.timestamp("us"),
    }
    out: dict = {}
    depth = 0
    field = ""
    fields = []
    for ch in schema_ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append(field)
            field = ""
        else:
            field += ch
    if field.strip():
        fields.append(field)
    for f_ in fields:
        parts = f_.strip().split(None, 1)
        if len(parts) != 2:
            continue
        name, typ = parts[0].strip("`"), parts[1].strip().lower()
        base = typ.split("(")[0].split("<")[0].strip()
        out[name] = simple.get(base, pa.string())
    return out


def _footer_file_stats(path: str, want_cols) -> Optional[dict]:
    """One parquet file's row-group footer statistics folded to per-file
    ``{col: (min, max, null_count)}`` plus row count and byte size.

    Returns None when the footer cannot PROVE exact stats — missing
    min/max on a chunk that isn't all-null (float NaN, INT96, writer
    opted out), or string/binary bounds long enough (≥ 48 bytes) that
    writer-side truncation may have rounded them — and the caller falls
    back to the data-scan collector. Pure pyarrow + os.stat: safe on
    executors, no Spark session."""
    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    idx = {}
    if md.num_row_groups:
        rg0 = md.row_group(0)
        for j in range(rg0.num_columns):
            idx[rg0.column(j).path_in_schema] = j
    cols = {}
    for c in want_cols:
        if md.num_row_groups and c not in idx:
            return None
        mn = mx = None
        nulls = 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(idx[c]).statistics
            if st is None or not st.has_null_count:
                return None
            nulls += st.null_count
            if st.null_count == rg.num_rows:
                continue  # all-null chunk: no bounds to contribute
            if not st.has_min_max:
                return None
            lo, hi = st.min, st.max
            for v in (lo, hi):
                if isinstance(v, (str, bytes)) and len(v) >= 48:
                    return None
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        cols[c] = (mn, mx, nulls)
    return {"n": md.num_rows, "size": os.path.getsize(path), "cols": cols}


def _strip_scheme(p: str) -> str:
    """file:/x, file:///x → /x (Hadoop FS URIs from _metadata.file_path)."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


def _pred_to_column(col: str, op: str, value):
    c = F.col(col)
    if op == ">=":
        return c >= value
    if op == "<=":
        return c <= value
    if op == "=":
        return c == value
    if op == "between":
        return (c >= value[0]) & (c <= value[1])
    if op == "in":
        # Catalyst pushes In to the parquet reader, where both dictionary
        # and footer-bloom row-group skipping apply per value
        return c.isin(*list(value))
    if op == "isnull":
        return c.isNull()
    if op == "notnull":
        return c.isNotNull()
    raise ValueError(f"unsupported predicate op {op!r}")


def statable_cols(meta) -> list:
    """Columns whose manifest stats may legitimately prune files:
    identity partition sources + stats_cols, MINUS default-valued
    columns. A defaulted column's physical NULLs read as the default
    (see :meth:`Table.read_data`), so its per-file min/max/null-count
    no longer describe what a scan observes — pruning or containment
    proofs on it would be unsound. Excluding it prunes less, never
    wrong; rewrites materialize the default and new files' stats become
    truthful again, but the column stays excluded while the default is
    live (cheap and simple beats tracking per-file schema generations).
    """
    cols = transforms.field_names(meta.partition_cols) + list(meta.stats_cols)
    dfl = json.loads(str(meta.properties.get(DEFAULTS_PROP, "{}")))
    if not dfl:
        return cols
    return [c for c in cols if c not in dfl]


def prune_manifest_spark(man_df: DataFrame, preds, stats_cols) -> list:
    """File-level min/max pruning as a Spark job over the manifest
    parquet (the ≥ SPARK_MANIFEST_THRESHOLD planner path — at 10^8 files
    the manifest itself is big data). Same soundness rules as
    :func:`prune_manifest`; returns the surviving relative paths."""
    cond = manifest_prune_cond(set(man_df.columns), preds, stats_cols)
    return [r[0] for r in man_df.filter(cond).select("path").collect()]


def manifest_prune_cond(cols: set, preds, stats_cols):
    """The file-survival predicate over manifest stats columns as one
    Catalyst Column — shared by the Spark pruning planner and the
    predicate-scoped maintenance operators (``compact(predicates=…)``),
    which filter the manifest RELATION with it instead of collecting
    surviving paths to the driver."""
    cond = F.lit(True)
    cols = set(cols)
    for col, op, value in preds:
        if op in ("isnull", "notnull"):
            # null-count stats: IS NULL keeps files with >= 1 null,
            # IS NOT NULL keeps files with >= 1 non-null row
            if col not in stats_cols or f"nulls_{col}" not in cols:
                continue
            nulls = F.col(f"nulls_{col}")
            c = (
                nulls > 0
                if op == "isnull"
                else nulls < F.col("record_count")
            )
            cond = cond & F.when(nulls.isNotNull(), c).otherwise(F.lit(True))
            continue
        if col not in stats_cols or f"min_{col}" not in cols:
            continue
        mn, mx = F.col(f"min_{col}"), F.col(f"max_{col}")
        has = mn.isNotNull() & mx.isNotNull()
        if op == ">=":
            c = mx >= value
        elif op == "<=":
            c = mn <= value
        elif op == "=":
            c = (mn <= value) & (mx >= value)
        elif op == "between":
            lo, hi = value
            c = (mx >= lo) & (mn <= hi)
        elif op == "in":
            # file survives iff ANY value falls inside its [min,max];
            # equivalent to between(min(values), max(values)) only for
            # contiguous sets, so test each value (bounded: an IN list is
            # plan-sized, not data-sized)
            vs = list(value)
            c = F.lit(False)
            for v in vs:
                c = c | ((mn <= v) & (mx >= v))
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        cond = cond & F.when(has, c).otherwise(F.lit(True))
    return cond


def prune_manifest(man: pd.DataFrame, preds, stats_cols) -> pd.DataFrame:
    """File-level min/max pruning of a manifest (pandas planner path).

    A file survives only if every predicate's range intersects the file's
    [min,max] for that column. Null-only files (min/max NaN) are kept —
    pruning must never be unsound.
    """
    mask = pd.Series(True, index=man.index)
    for col, op, value in preds:
        if col not in stats_cols:
            continue  # no stats → cannot prune on this column
        if op in ("isnull", "notnull"):
            if f"nulls_{col}" not in man.columns:
                continue
            nulls = man[f"nulls_{col}"]
            has = nulls.notna()
            cond = pd.Series(True, index=man.index)
            if op == "isnull":
                cond.loc[has] = nulls[has] > 0
            else:
                cond.loc[has] = nulls[has] < man.loc[has, "record_count"]
            mask &= cond
            continue
        if f"min_{col}" not in man.columns:
            # stats never collected for this column (e.g. manifests from
            # before a partition-spec evolution) → cannot prune, keep all
            continue
        mn, mx = man[f"min_{col}"], man[f"max_{col}"]
        has = mn.notna() & mx.notna()
        # compare only rows WITH stats: object-dtype columns (strings)
        # raise on NaN comparisons, and stat-less rows must be kept anyway
        cond = pd.Series(True, index=man.index)
        m, x = mn[has], mx[has]
        if op == ">=":
            cond.loc[has] = x >= value
        elif op == "<=":
            cond.loc[has] = m <= value
        elif op == "=":
            cond.loc[has] = (m <= value) & (x >= value)
        elif op == "between":
            lo, hi = value
            cond.loc[has] = (x >= lo) & (m <= hi)
        elif op == "in":
            acc = pd.Series(False, index=m.index)
            for v in value:
                acc |= (m <= v) & (x >= v)
            cond.loc[has] = acc
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        mask &= cond
    return man[mask]


# Iceberg v2 write-mode properties (write.delete.mode / write.update.mode /
# write.merge.mode): the TABLE declares whether its DML defaults to
# copy-on-write (bulk-change friendly) or merge-on-read (sparse-change
# friendly); operators resolve mode=None against these, and an explicit
# mode= argument always wins — exactly Iceberg's precedence.
WRITE_DELETE_MODE_PROP = "write.delete.mode"
WRITE_UPDATE_MODE_PROP = "write.update.mode"
WRITE_MERGE_MODE_PROP = "write.merge.mode"


def resolve_write_mode(meta: "TableMetadata", op: str, mode) -> str:
    """``mode`` if given, else the table's ``write.<op>.mode`` property,
    else copy-on-write (Iceberg's default)."""
    if mode is not None:
        return mode
    return str(
        meta.properties.get(f"write.{op}.mode", "copy-on-write")
    ).strip().lower()
