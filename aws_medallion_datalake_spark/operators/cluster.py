"""Z-order / Hilbert clustering rewrite.

The reference has no clustering at all (SURVEY.md §4 "data clustering /
sort order: none") — this implements the north_star requirement: compute a
64-bit Morton or Hilbert key over (phash, w, h), range-repartition the
table on (partition cols, key), sort within partitions, rewrite, and
recompute per-file min/max stats so the manifest becomes an effective
pruning index for phash/w/h predicates.

Spark-first details:
- the Morton key is a pure Catalyst column expression
  (functions/udfs.py::morton64_expr) — the whole plan stays inside
  whole-stage codegen; Hilbert uses a vectorized pandas UDF (Arrow batches).
- ``repartitionByRange`` samples the key distribution, so output files get
  balanced row counts even under the hot-phash skew tail; an optional salt
  column splits pathological single-key ranges (RangePartitioner keeps
  equal keys in one partition — exactly the hot-bucket failure mode).
- one shuffle total; file count = ceil(bytes / target_file_size).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import hilbert64_udf, morton64_expr
from ..sources.tableformat import Snapshot, Table

_KEY = "__cluster_key"
_SALT = "__cluster_salt"


def cluster(
    table: Table,
    spark: SparkSession,
    *,
    curve: str = "morton",
    cols: tuple = ("phash", "w", "h"),
    target_file_size_bytes: int = 128 * 1024 * 1024,
    n_salt: int = 4,
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

    df = table.scan(spark, snapshot_id=snapshot_id)
    c0, c1, c2 = (F.col(c) for c in cols)
    if curve == "hilbert":
        key = hilbert64_udf(c0, c1, c2)
    else:  # morton / zorder: JVM-side expression, no Python boundary
        key = morton64_expr(c0, c1, c2)
    df = df.withColumn(_KEY, key)
    # Salt splits hot single-key ranges (e.g. the 4 hot phash buckets that
    # hold ~10% of rows) across partitions; the range sort keeps salted
    # siblings adjacent so pruning power is unaffected.
    df = df.withColumn(_SALT, F.pmod(F.xxhash64("image_id"), F.lit(n_salt)))
    range_cols = [F.col(c) for c in meta.partition_cols] + [F.col(_KEY), F.col(_SALT)]
    # repartitionByRange runs a boundary-sampling job over its child plan,
    # which would read every image payload and compute every curve key
    # TWICE; persisting the keyed scan makes the sample + shuffle read a
    # local (memory/disk) copy instead. At ≥PB scale swap this for
    # manifest-stats-derived boundaries + hash routing on a bucket id.
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out = (
            df.repartitionByRange(n_out, *range_cols)
            .sortWithinPartitions(*range_cols)
            .drop(_KEY, _SALT)
        )
        entries = table.write_files(out)
    finally:
        df.unpersist()
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
