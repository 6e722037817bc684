"""Z-order / Hilbert clustering rewrite.

The reference has no clustering at all (SURVEY.md §4 "data clustering /
sort order: none") — this implements the north_star requirement: compute a
64-bit Morton or Hilbert key over (phash, w, h), partition the table into
key ranges, sort within partitions, rewrite, and recompute per-file
min/max stats so the manifest becomes an effective pruning index for
phash/w/h predicates.

Spark-first execution plan (ONE full pass over the payload):

1. **Boundary planning on a column-pruned scan** — the curve key needs
   only (partition cols, phash, w, h), a few bytes/row, so range
   boundaries come from ``approxQuantile`` over a scan that never touches
   the image payload. (A plain ``repartitionByRange`` instead runs its
   boundary-sampling job over the FULL child plan — every payload byte
   read and every key computed twice, or a cluster-wide persist.)
2. **Exact hash routing** — rows get a bucket id by binary-search-count
   against the boundary array (vectorized ``size(filter(...))``), then a
   pre-computed *routing salt* per bucket such that Spark's
   HashPartitioning lands bucket i exactly in partition i
   (``pmod(hash(salt_i), n) == i``). ``repartition(n, route)`` is then a
   single exact shuffle — no sampling, no skewed modulo collisions.
3. **Sort within partitions + write** — files come out key-clustered and
   ≈target-sized; stats are collected by one grouped aggregate.

Skew: low bits of the composite bucket key carry a per-row salt, so a hot
single key (the phash hot-bucket tail) is split across adjacent buckets
while staying contiguous on disk — pruning power unaffected.

Scale bound: the boundary array is evaluated per row (O(n_out)); cluster
jobs should bound n_out (≈ ≤4096 files → 512 GB per job at 128 MB files)
and tile bigger tables by partition — the per-partition jobs are
embarrassingly parallel, same shape as compaction groups.

- the Morton key is a pure Catalyst column expression
  (functions/udfs.py::morton64_expr) — whole-stage codegen end-to-end;
  Hilbert uses a vectorized pandas UDF (Arrow batches) and pays one
  Python boundary on the pruned scan and one on the full pass.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import hilbert64_udf, morton64_expr
from ..sources.tableformat import Snapshot, Table

_KEY = "__cluster_key"
_BUCKET = "__cluster_bucket"
_ROUTE = "__cluster_route"

_SALT_BITS = 2  # low bits of the composite key: splits hot single keys


def exact_route_salts(spark: SparkSession, n_out: int) -> list:
    """For each target partition i, an int s_i with
    ``pmod(murmur3_hash(s_i), n_out) == i`` — makes
    ``df.repartition(n_out, route)`` an EXACT router (HashPartitioning
    uses the same Murmur3Hash expression as ``F.hash``)."""
    cand = spark.range(0, max(n_out * 64, 4096)).select(
        F.col("id").cast("int").alias("c"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_out)).alias("b"),
    )
    pdf = cand.groupBy("b").agg(F.min("c").alias("c")).toPandas()
    salts: list = [None] * n_out
    for _, row in pdf.iterrows():
        salts[int(row["b"])] = int(row["c"])
    missing = [i for i, s in enumerate(salts) if s is None]
    if missing:  # vanishingly unlikely with 64x candidates; widen search
        return exact_route_salts_fallback(spark, n_out, salts, missing)
    return salts


def exact_route_salts_fallback(spark, n_out, salts, missing):
    cand = spark.range(0, n_out * 4096).select(
        F.col("id").cast("int").alias("c"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_out)).alias("b"),
    )
    pdf = cand.groupBy("b").agg(F.min("c").alias("c")).toPandas()
    for _, row in pdf.iterrows():
        if salts[int(row["b"])] is None:
            salts[int(row["b"])] = int(row["c"])
    if any(s is None for s in salts):
        raise RuntimeError(f"could not find routing salts for n_out={n_out}")
    return salts


def _curve_key(curve: str, cols: tuple):
    c0, c1, c2 = (F.col(c) for c in cols)
    if curve == "hilbert":
        return hilbert64_udf(c0, c1, c2)
    return morton64_expr(c0, c1, c2)  # morton / zorder: JVM-only


def _composite(key, partition_cols: list, part_values: list):
    """61-bit sortable long: (partition idx | key>>9 | per-row salt)."""
    comp = F.shiftrightunsigned(key.cast("long"), 9)
    if _SALT_BITS:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in ("image_id",)]), F.lit(1 << _SALT_BITS))
        comp = F.shiftleft(comp, _SALT_BITS).bitwiseOR(salt)
    if partition_cols and part_values:
        idx = F.array_position(
            F.array(*[F.lit(v) for v in part_values]), F.col(partition_cols[0])
        ).cast("long")  # 1-based; 0 (not found / __mixed__) sorts first
        comp = F.shiftleft(idx, 56).bitwiseOR(comp)
    return comp


def cluster(
    table: Table,
    spark: SparkSession,
    *,
    curve: str = "morton",
    cols: tuple = ("phash", "w", "h"),
    target_file_size_bytes: int = 128 * 1024 * 1024,
    n_salt: int = 4,  # kept for API compat; salting now lives in _composite
    snapshot_id: Optional[int] = None,
) -> Snapshot:
    """Rewrite the whole table clustered by the chosen space-filling curve."""
    if curve not in ("hilbert", "morton", "zorder"):
        raise ValueError(f"unknown curve {curve!r}")
    t0 = time.time()
    meta = table.metadata()
    man = table.manifest_pdf(snapshot_id)
    total_bytes = int(man["file_size_bytes"].sum())
    n_out = max(1, round(total_bytes / target_file_size_bytes))

    # distinct partition values straight from the manifest (no data read)
    part_values: list = []
    if meta.partition_cols:
        import json as _json

        vals = {
            _json.loads(pj).get(meta.partition_cols[0])
            for pj in man["partition_json"].unique()
        }
        part_values = sorted(v for v in vals if v is not None and v != "__mixed__")

    key = _curve_key(curve, cols)
    sort_cols = [F.col(c) for c in meta.partition_cols] + [F.col(_KEY)]

    if n_out == 1:
        df = table.scan(spark, snapshot_id=snapshot_id).withColumn(_KEY, key)
        out = df.coalesce(1).sortWithinPartitions(*sort_cols).drop(_KEY)
        entries = table.write_files(out)
    else:
        # 1. boundaries from the PRUNED scan (no payload IO)
        need = list(dict.fromkeys(list(meta.partition_cols) + list(cols) + ["image_id"]))
        pruned = table.scan(spark, snapshot_id=snapshot_id, columns=need)
        ck = _composite(key, meta.partition_cols, part_values)
        probs = [i / n_out for i in range(1, n_out)]
        bounds = (
            pruned.select(ck.alias("ck"))
            .approxQuantile("ck", probs, 1.0 / (4 * n_out))
        )
        bounds = sorted(int(b) for b in bounds)

        # 2. one full pass: bucket → exact-route shuffle → sort → write
        salts = exact_route_salts(spark, n_out)
        df = table.scan(spark, snapshot_id=snapshot_id).withColumn(_KEY, key)
        barr = F.array(*[F.lit(b) for b in bounds])
        ckf = _composite(F.col(_KEY), meta.partition_cols, part_values)
        bucket = F.size(F.filter(barr, lambda b: b < ckf))
        route = F.element_at(
            F.array(*[F.lit(s) for s in salts]), bucket + 1
        ).cast("int")
        out = (
            df.withColumn(_ROUTE, route)
            .repartition(n_out, F.col(_ROUTE))
            .sortWithinPartitions(*sort_cols)
            .drop(_KEY, _ROUTE)
        )
        entries = table.write_files(out)

    snap = table.commit(
        "replace",
        entries,
        {
            "stage": "cluster",
            "curve": curve,
            "cluster_cols": list(cols),
            "files_in": int(len(man)),
            "files_out": int(len(entries)),
            "duration_sec": round(time.time() - t0, 3),
        },
    )
    return snap


def clustering_quality(table: Table, col: str = "phash") -> float:
    """Average pairwise min/max overlap fraction on `col` across files —
    lower is better pruning; 0 = perfectly disjoint ranges."""
    man = table.manifest_pdf()
    lo = man[f"min_{col}"].to_numpy()
    hi = man[f"max_{col}"].to_numpy()
    n = len(man)
    if n < 2:
        return 0.0
    overlaps = 0
    for i in range(n):
        overlaps += int(((lo < hi[i]) & (hi > lo[i])).sum()) - 1
    return overlaps / (n * (n - 1))
