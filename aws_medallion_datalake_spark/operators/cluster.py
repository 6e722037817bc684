"""Z-order / Hilbert clustering rewrite.

The reference has no clustering at all (SURVEY.md §4 "data clustering /
sort order: none") — this implements the north_star requirement: compute a
64-bit Morton or Hilbert key over (phash, w, h), partition the table into
key ranges, sort within partitions, rewrite, and recompute per-file
min/max stats so the manifest becomes an effective pruning index for
phash/w/h predicates.

Spark-first execution plan (ONE full pass over the payload per tile):

1. **Tiling** — the manifest is split into *tiles* of at most
   ``max_files_per_job`` output files each (partition-major order, so a
   tile rarely straddles a partition). Each tile is an independent
   boundary-plan + route + sort + write job; tiles run concurrently from
   a driver thread pool (the Iceberg RewriteDataFiles architecture). At
   10^12 rows / 10^8 files no single job ever plans more than
   ``max_files_per_job`` ranges — the driver never materializes an
   O(total_files) structure in any query plan.
2. **Boundary planning on a column-pruned scan** — the curve key needs
   only (partition cols, phash, w, h), a few bytes/row, so range
   boundaries come from ``approxQuantile`` over a scan that never touches
   the image payload. (A plain ``repartitionByRange`` instead runs its
   boundary-sampling job over the FULL child plan — every payload byte
   read and every key computed twice, or a cluster-wide persist.)
3. **Exact-route shuffle, zero plan literals** — rows get their target
   partition from one vectorized Arrow UDF: ``np.searchsorted`` against
   the tile's boundary array, then a *routing salt* per bucket such that
   Spark's HashPartitioning lands bucket i exactly in partition i
   (``pmod(murmur3(salt_i), n) == i``; salts are found driver-side with
   a numpy murmur3 that bit-matches Spark's ``F.hash``). The boundary
   and salt arrays travel to executors as one ``sc.broadcast`` — the
   query plan itself is O(1) in the file count, and routing is
   O(log n_out) per row instead of the old O(n_out) literal-array
   evaluation. ``repartition(n, route)`` is then a single exact shuffle:
   no sampling, no skewed modulo collisions.
4. **Sort within partitions + write** — files come out key-clustered and
   ≈target-sized; stats for all tiles are collected by one grouped
   aggregate, and all tiles commit as ONE replace snapshot.

Skew: low bits of the composite bucket key carry a per-row salt, so a hot
single key (the phash hot-bucket tail) is split across adjacent buckets
while staying contiguous on disk — pruning power unaffected.

Resumability (north_rule): with a ``checkpoint``, each finished tile
appends a ``unit_done`` lineage record (source snapshot, input files,
rows/bytes, output prefix); a killed run redoes only unfinished tiles.

The Morton key is a pure Catalyst column expression
(functions/udfs.py::morton64_expr) — whole-stage codegen end-to-end;
Hilbert uses a vectorized pandas UDF (Arrow batches). The route UDF
transfers ONE int64 column to Python and one int32 back per batch —
payload bytes never cross the Arrow boundary.
"""

from __future__ import annotations

import re
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..functions.udfs import hilbert64_udf, morton64_expr
from ..sources import transforms
from ..sources.tableformat import (
    Snapshot,
    Table,
    read_split_size,
    statable_cols,
)
from .checkpoint import RunCheckpoint
from .timing import PhaseTimer

_KEY = "__cluster_key"
_ROUTE = "__cluster_route"

_SALT_BITS = 2  # low bits of the composite key: splits hot single keys


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of a single IntegerType value (bit-exact with
    ``F.hash(col.cast("int"))``) — lets the driver plan exact-route salts
    without a Spark job. Returns a signed int32."""
    M = 0xFFFFFFFF
    k = (x & M) * 0xCC9E2D51 & M
    k = ((k << 15 | k >> 17) & M) * 0x1B873593 & M
    h = seed ^ k
    h = ((h << 13 | h >> 19) & M) * 5 + 0xE6546B64 & M
    h ^= 4  # length in bytes
    h ^= h >> 16
    h = h * 0x85EBCA6B & M
    h ^= h >> 13
    h = h * 0xC2B2AE35 & M
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def route_exact(df, idx_col, n_out: int):
    """Shuffle each row whose 0-based ``idx_col`` value lies in
    ``[0, n_out)`` to EXACTLY output partition ``idx_col`` — the
    reusable form of the exact hash-routing used by cluster tiles and
    the silver refine: one shuffle, partition-homogeneous outputs,
    no repartitionByRange sampling job. Callers writing a
    ``bucket(N, key)``-partitioned table route with
    ``route_exact(df, transform.expr(), N)`` before ``write_files``."""
    salts = [int(s) for s in exact_route_salts(n_out)]
    route = F.element_at(
        F.array(*[F.lit(s) for s in salts]), idx_col.cast("int") + 1
    )
    return (
        df.withColumn("__rt", route.cast("int"))
        .repartition(n_out, F.col("__rt"))
        .drop("__rt")
    )


def exact_route_salts(n_out: int) -> np.ndarray:
    """For each target partition i, an int s_i with
    ``pmod(murmur3(s_i), n_out) == i`` — makes ``repartition(n_out,
    route)`` an EXACT router (HashPartitioning uses the same Murmur3Hash
    as ``F.hash``). Pure driver-side; expected O(n_out·ln n_out) probes
    (coupon collector), ~40k for n_out=4096."""
    salts = np.full(n_out, -1, dtype=np.int64)
    remaining = n_out
    c = 0
    limit = max(n_out, 64) * 64
    while remaining and c < limit:
        b = _murmur3_int32(c) % n_out  # Python %: already non-negative
        if salts[b] < 0:
            salts[b] = c
            remaining -= 1
        c += 1
    if remaining:
        raise RuntimeError(f"could not find routing salts for n_out={n_out}")
    return salts


def _curve_key(curve: str, cols: tuple):
    c0, c1, c2 = (F.col(c) for c in cols)
    if curve == "hilbert":
        return hilbert64_udf(c0, c1, c2)
    return morton64_expr(c0, c1, c2)  # morton / zorder: JVM-only


_PART_SEP = "\x1f"  # multi-level partition tuple separator


def _part_key_col(partition_cols: list):
    """One string per partition TUPLE — supports multi-level specs like
    the reference's year=/month=/day= layout
    (/root/reference/scripts/bronze_digit.py:143-148) and hidden-
    partitioning transforms (the tuple is built from the TRANSFORM
    values, cast to string to match the manifest's partition_json
    values)."""
    pexprs = [t.expr().cast("string") for t in transforms.parse_spec(partition_cols)]
    if len(pexprs) == 1:
        return pexprs[0]
    return F.concat_ws(_PART_SEP, *pexprs)


def _composite(key, partition_cols: list, part_values: list):
    """Sortable long: (partition idx << 56 | key>>10 << 2 | per-row salt).

    The partition idx orders the full partition TUPLE (all partition
    columns, multi-level specs included), so the global sort is
    partition-major across every level, then key-ordered within.

    The key+salt field is exactly 56 bits (64 - 10 + 2) so it NEVER
    overlaps the partition-index field — an overlap would OR high-key
    rows into the wrong partition band and interleave distant key
    regions inside one range bucket (wide file min/max, broken
    pruning)."""
    comp = F.shiftrightunsigned(key.cast("long"), 10)
    if _SALT_BITS:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in ("image_id",)]), F.lit(1 << _SALT_BITS))
        comp = F.shiftleft(comp, _SALT_BITS).bitwiseOR(salt)
    if partition_cols and part_values:
        idx = F.array_position(
            F.array(*[F.lit(v) for v in part_values]), _part_key_col(partition_cols)
        ).cast("long")  # 1-based; 0 (not found / __mixed__) sorts first
        comp = F.shiftleft(idx, 56).bitwiseOR(comp)
    return comp


# Up to this output-file count, routing stays a pure-JVM expression (no
# Arrow hop, no Python workers): the per-row cost is a linear O(n_out)
# scan of a constant-folded boundary array, so it only wins while n_out
# is small; past this the broadcast binary-search Arrow UDF
# (O(log n_out), vectorized) takes over. Either way the literal count is
# bounded by TILING (a tile never plans more than max_files_per_job =
# 4096 outputs), so the plan can never grow the 800k-literal failure
# mode.
_JVM_ROUTE_MAX = 512


def _route_udf(spark: SparkSession, bounds: np.ndarray, salts: np.ndarray):
    """Vectorized bucket router: count of boundaries < key (binary
    search), mapped through the exact-route salt table. The two arrays
    ride one broadcast — the query plan carries no per-file literals."""
    bc = spark.sparkContext.broadcast((bounds, salts.astype(np.int32)))

    @F.pandas_udf(IntegerType())
    def route(ck: pd.Series) -> pd.Series:
        b, s = bc.value
        v = ck.to_numpy()
        if v.dtype != np.int64:  # nulls upstream → float; keys are coalesced
            v = np.nan_to_num(v, nan=float(np.iinfo(np.int64).min)).astype(np.int64)
        return pd.Series(s[np.searchsorted(b, v, side="left")])

    return route, bc


def _route_jvm(ck_col, bounds: np.ndarray, salts: np.ndarray):
    """Small-n_out router as a Catalyst expression over the MATERIALIZED
    key column (single evaluation per row). ``aggregate`` accumulates a
    scalar rank — unlike ``size(filter(...))``, which materializes a
    filtered ARRAY per row (n_out-element allocation × every row of the
    tile, pure GC churn on the hot rewrite path)."""
    barr = F.array(*[F.lit(int(b)) for b in bounds])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(b < ck_col, 1).otherwise(0),
    )
    sarr = F.array(*[F.lit(int(s)) for s in salts])
    return F.element_at(sarr, bucket + 1).cast("int")


def _plan_tiles(man: pd.DataFrame, target_bytes: int, max_files_per_job: int) -> list:
    """Split manifest rows into partition-major tiles whose OUTPUT file
    count stays ≤ max_files_per_job. Returns a list of pandas index
    arrays. Cross-tile key ranges may overlap only where a partition is
    split across tiles — per-file min/max pruning is unaffected."""
    order = man.sort_values(["partition_json", "path"]).index
    cap = max_files_per_job * target_bytes
    tiles, cur, cur_bytes = [], [], 0
    sizes = man["file_size_bytes"]
    for idx in order:
        b = int(sizes[idx])
        if cur and cur_bytes + b > cap:
            tiles.append(cur)
            cur, cur_bytes = [], 0
        cur.append(idx)
        cur_bytes += b
    if cur:
        tiles.append(cur)
    return tiles


_SORTED_PREFIX_PROP = "cluster.sorted_prefixes"
_SORT_SPEC_PROP = "cluster.sort_spec"
SORT_ORDER_PROP = "sort.order"


def cluster(
    table: Table,
    spark: SparkSession,
    *,
    curve: Optional[str] = None,
    cols: Optional[tuple] = None,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    max_files_per_job: int = 4096,
    tile_parallelism: int = 4,
    snapshot_id: Optional[int] = None,
    checkpoint: Optional[RunCheckpoint] = None,
    mode: str = "auto",
    incremental_max_dirty_frac: float = 0.5,
    predicates: Optional[list] = None,
) -> Optional[Snapshot]:
    """Rewrite the table clustered by the chosen space-filling curve.

    ``predicates``: scope the rewrite to files whose stats intersect the
    scan-style ``(col, op, value)`` predicates (whole-file selection,
    never row filtering) — ``OPTIMIZE … WHERE`` for a 10^12-row table
    where only the hot partitions need re-clustering. Composes with
    ``mode="incremental"``: already-sorted generations are kept first,
    then the predicate scopes the remaining dirty set.

    ``mode``:

    - ``"full"`` — rewrite every data file (round-1 behavior).
    - ``"incremental"`` — rewrite ONLY files not already produced by a
      previous cluster run with the same sort spec. Each cluster commit
      records its output directory prefixes in the table property
      ``cluster.sorted_prefixes`` (+ ``cluster.sort_spec``); files still
      living under those prefixes are key-sorted and internally disjoint,
      so they are KEPT as-is (manifest entries reused, zero IO) and only
      the delta — new appends, merge deltas, compaction outputs — is
      routed/sorted/written. At 10^12-row scale this is the difference
      between rewriting the whole table nightly and rewriting the day's
      ingest: per-file min/max pruning quality is preserved because each
      generation's files stay disjoint within itself.
    - ``"auto"`` (default) — incremental when a matching sorted
      generation exists and the dirty fraction is at most
      ``incremental_max_dirty_frac`` of table bytes; full otherwise
      (rewriting nearly everything incrementally would just fragment
      generations without saving IO).

    Returns None (no commit) when an incremental run finds nothing dirty.
    """
    # declared sort order (Iceberg write-order analogue): when the caller
    # names neither curve nor cols, the table's `sort.order` property —
    # "morton(phash,w,h)" / "hilbert(a,b)" — decides, so `OPTIMIZE`,
    # `--stages auto` policy runs and bare cluster() calls all honor the
    # table's own declaration; engine defaults apply last
    if curve is None and cols is None:
        prop = str(table.metadata().properties.get(SORT_ORDER_PROP, "") or "")
        pm = re.match(r"(morton|hilbert|zorder)\(([^)]+)\)$", prop.strip())
        # a plain column list ("ts" / "ts, id") is a LINEAR Iceberg sort
        # order — honored by write_files' range distribution at ingest,
        # not a space-filling curve; bare cluster() falls back to the
        # engine default curve rather than failing
        plain = re.match(
            r"[A-Za-z_]\w*(\s*,\s*[A-Za-z_]\w*)*$", prop.strip()
        )
        if prop and not pm and not plain:
            raise ValueError(
                f"bad {SORT_ORDER_PROP} property {prop!r}: expected "
                "curve(col, …) with curve in morton|hilbert|zorder, "
                "or a plain column list"
            )
        if pm:
            curve = pm.group(1)
            cols = tuple(c.strip() for c in pm.group(2).split(","))
    curve = curve or "morton"
    cols = tuple(cols) if cols else ("phash", "w", "h")
    if curve not in ("hilbert", "morton", "zorder"):
        raise ValueError(f"unknown curve {curve!r}")
    if mode not in ("auto", "full", "incremental"):
        raise ValueError(f"unknown mode {mode!r}")
    if table.pending_delete_paths() or table.pending_eq_deletes():
        # tile rewrites copy whole files, resurrecting rows a pending
        # positional/equality delete suppresses — materialize them first
        raise ValueError(
            "table has merge-on-read deletes pending; run apply_deletes() "
            "before clustering"
        )
    t0 = time.time()
    pt = PhaseTimer()
    meta = table.metadata()
    src_snapshot = meta.current_snapshot_id
    man = table.manifest_pdf(snapshot_id)

    import json as _json

    # files written by a previous cluster run with this exact sort spec
    # are already sorted + disjoint: incremental mode keeps them untouched
    spec = f"{curve}({','.join(cols)})"
    prev_prefixes: list = []
    if meta.properties.get(_SORT_SPEC_PROP) == spec:
        prev_prefixes = _json.loads(meta.properties.get(_SORTED_PREFIX_PROP, "[]"))
    if len(man) and prev_prefixes:
        sorted_mask = man["path"].str.startswith(
            tuple(p.rstrip("/") + "/" for p in prev_prefixes)
        )
    else:
        sorted_mask = pd.Series(False, index=man.index)
    total_bytes = int(man["file_size_bytes"].sum()) if len(man) else 0
    dirty_bytes = int(man.loc[~sorted_mask, "file_size_bytes"].sum()) if len(man) else 0
    incremental = mode == "incremental" or (
        mode == "auto"
        and bool(sorted_mask.any())
        and dirty_bytes <= incremental_max_dirty_frac * max(total_bytes, 1)
    )
    if incremental:
        keep, work = man[sorted_mask], man[~sorted_mask]
    else:
        keep, work = man.iloc[0:0], man
    if predicates and len(work):
        from ..sources.tableformat import prune_manifest

        scoped = prune_manifest(
            work,
            transforms.extend_predicates(meta.partition_cols, list(predicates)),
            statable_cols(meta),
        )
        keep = man[~man["path"].isin(scoped["path"])]
        work = scoped
    if work.empty:
        return None  # nothing in scope / fully clustered: nothing to commit

    # distinct partition TUPLES straight from the manifest (no data read);
    # multi-level specs (year=/month=/day=) join levels with _PART_SEP
    part_values: list = []
    if meta.partition_cols:
        vals = set()
        for pj in work["partition_json"].unique():
            d = _json.loads(pj)
            levels = [d.get(c) for c in transforms.field_names(meta.partition_cols)]
            if any(v is None or v == "__mixed__" for v in levels):
                continue
            vals.add(_PART_SEP.join(str(v) for v in levels))
        part_values = sorted(vals)

    key = _curve_key(curve, cols)
    sort_cols = transforms.exprs(meta.partition_cols) + [F.col(_KEY)]
    need = list(
        dict.fromkeys(
            transforms.source_cols(meta.partition_cols) + list(cols) + ["image_id"]
        )
    )
    schema = table._schema(spark)

    pruned_cache = None
    if meta.partition_cols and not part_values and len(work):
        # mixed input files (raw bronze): learn the partition tuples from
        # a column-pruned distinct — reads only key/partition columns of
        # the FILES BEING REWRITTEN, no payloads — so clustering is
        # partition-major even on a table whose current layout ignores
        # partitions. The pruned frame is CACHED: the per-tile boundary
        # quantiles re-aggregate it instead of re-reading the files (one
        # planning pass, not two).
        import os as _os

        work_paths = [_os.path.join(table.root, p) for p in work["path"]]
        pruned_cache = table.read_data(spark, work_paths).select(*need).persist()
        part_values = sorted(
            r[0]
            for r in pruned_cache.select(
                _part_key_col(list(meta.partition_cols)).alias("pk")
            )
            .distinct()
            .collect()
            if r[0] is not None
        )

    tiles = _plan_tiles(work, target_file_size_bytes, max_files_per_job)
    if not tiles:  # empty table: nothing to rewrite
        return table.commit(
            "replace", man, {"stage": "cluster", "noop": True, "tiles": 0}
        )
    prefixes: dict = {}
    broadcasts: list = []
    stats_frames: dict = {}

    def stats_for(tile_no: int, prefix: str) -> None:
        # per-tile stats collected INSIDE the tile's own thread, the
        # moment its write lands (or its checkpoint resume resolves):
        # tile A's stats job overlaps tile B's write instead of forming
        # a serial post-barrier tail (measured 1-5 s on the bench).
        with pt.phase("stats"):
            stats_frames[tile_no] = table.collect_stats_for_prefix(
                spark, prefix
            )

    def run_tile(tile_no: int, idxs: list) -> None:
        import os

        unit = f"tile-{tile_no}"
        if checkpoint is not None and checkpoint.is_unit_done("cluster", unit):
            prefixes[tile_no] = checkpoint.unit_payload("cluster", unit)["output_prefix"]
            stats_for(tile_no, prefixes[tile_no])
            return
        rows = work.loc[idxs]
        paths = [os.path.join(table.root, p) for p in rows["path"]]
        tile_bytes = int(rows["file_size_bytes"].sum())
        n_out = max(1, round(tile_bytes / target_file_size_bytes))
        full = table.read_data(spark, paths).withColumn(_KEY, key)
        if n_out == 1:
            out = full.coalesce(1).sortWithinPartitions(*sort_cols).drop(_KEY)
        else:
            # 1. boundaries from the PRUNED scan (no payload IO); reuse
            #    the cached planning frame when it covers exactly this
            #    tile (single-tile tables: one planning pass total)
            if pruned_cache is not None and len(tiles) == 1:
                pruned = pruned_cache
            else:
                pruned = table.read_data(spark, paths).select(*need)
            ck = F.coalesce(
                _composite(key, meta.partition_cols, part_values),
                F.lit(np.iinfo(np.int64).min + 1),
            )
            probs = [i / n_out for i in range(1, n_out)]
            with pt.phase("quantile"):
                bounds = pruned.select(ck.alias("ck")).approxQuantile(
                    "ck", probs, 1.0 / (4 * n_out)
                )
            bounds = np.sort(np.array(bounds, dtype=np.int64))
            # 2. one full pass: route → exact shuffle → sort → write.
            #    The composite key is materialized as a column FIRST so
            #    it is evaluated once per row on either route path.
            salts = exact_route_salts(n_out)
            ckf = F.coalesce(
                _composite(F.col(_KEY), meta.partition_cols, part_values),
                F.lit(np.iinfo(np.int64).min + 1),
            )
            keyed = full.withColumn("__ck", ckf)
            if n_out <= _JVM_ROUTE_MAX:
                routed = keyed.withColumn(_ROUTE, _route_jvm(F.col("__ck"), bounds, salts))
            else:
                route, bc = _route_udf(spark, bounds, salts)
                broadcasts.append(bc)
                routed = keyed.withColumn(_ROUTE, route(F.col("__ck")))
            out = (
                routed.repartition(n_out, F.col(_ROUTE))
                .sortWithinPartitions(*sort_cols)
                .drop(_KEY, _ROUTE, "__ck")
            )
        prefix = table.new_data_prefix()
        with pt.phase("rewrite"):
            table.data_writer(out).parquet(prefix)
        prefixes[tile_no] = prefix
        if checkpoint is not None:
            checkpoint.unit_done(
                "cluster",
                unit,
                {
                    "source_snapshot_id": src_snapshot,
                    "input_files": list(rows["path"]),
                    "input_bytes": tile_bytes,
                    "input_records": int(rows["record_count"].sum()),
                    "output_prefix": prefix,
                },
            )
        stats_for(tile_no, prefix)

    # Read splits aligned with the target file size for the whole stage:
    # the default 128 MB split caps the read/route stage at
    # total_bytes/128MB tasks no matter how many executors exist; one
    # split ≈ one input file keeps scan parallelism proportional to the
    # table, matching the shuffle side's n_out partitions.
    with read_split_size(spark, target_file_size_bytes):
        if len(tiles) == 1:
            run_tile(0, tiles[0])
        else:
            with ThreadPoolExecutor(max_workers=max(1, tile_parallelism)) as pool:
                futures = [pool.submit(run_tile, i, t) for i, t in enumerate(tiles)]
                for f in futures:
                    f.result()  # surface the first failure

    entries = pd.concat(
        [stats_frames[i] for i in range(len(tiles))], ignore_index=True
    )
    import os as _os

    # sorted-generation bookkeeping: output prefixes of this run, plus any
    # previous generation's prefixes that still own kept files (dead
    # prefixes — fully rewritten by a later full run — are dropped so the
    # property stays O(cluster runs since last full rewrite))
    new_rel = sorted(
        {_os.path.relpath(prefixes[i], table.root) for i in range(len(tiles))}
    )
    # (keyed on kept files, not the incremental flag: a predicate-scoped
    # full run also keeps files, whose generations stay live)
    live_old = [
        p
        for p in prev_prefixes
        if len(keep) and bool(keep["path"].str.startswith(p.rstrip("/") + "/").any())
    ]
    props = {
        _SORT_SPEC_PROP: spec,
        _SORTED_PREFIX_PROP: _json.dumps(sorted(set(live_old) | set(new_rel))),
    }
    full_manifest = (
        pd.concat([keep, entries], ignore_index=True) if len(keep) else entries
    )
    snap = table.commit(
        "replace",
        full_manifest,
        {
            "stage": "cluster",
            "mode": "incremental" if incremental else "full",
            "curve": curve,
            "cluster_cols": list(cols),
            "files_in": int(len(work)),
            "files_kept": int(len(keep)),
            "files_out": int(len(entries)),
            "tiles": len(tiles),
            "duration_sec": round(time.time() - t0, 3),
            "phase_sec": pt.summary(),
        },
        properties=props,
    )
    for bc in broadcasts:
        bc.unpersist()
    if pruned_cache is not None:
        pruned_cache.unpersist()
    if checkpoint is not None:
        checkpoint.stage_done("cluster", dict(snap.summary, snapshot_id=snap.snapshot_id))
    return snap


def clustering_quality(table: Table, col: str = "phash") -> float:
    """Average pairwise min/max overlap fraction on `col` across files of
    the SAME partition — lower is better pruning; 0 = perfectly disjoint
    ranges. Cross-partition pairs are excluded: partition-major layout
    makes every partition span the full key range by design, and real
    scans prune on the partition column first."""
    man = table.manifest_pdf()
    total_pairs = 0
    overlaps = 0
    for _, part in man.groupby("partition_json"):
        lo = part[f"min_{col}"].to_numpy()
        hi = part[f"max_{col}"].to_numpy()
        n = len(part)
        if n < 2:
            continue
        total_pairs += n * (n - 1)
        for i in range(n):
            overlaps += int(((lo < hi[i]) & (hi > lo[i])).sum()) - 1
    return overlaps / total_pairs if total_pairs else 0.0
