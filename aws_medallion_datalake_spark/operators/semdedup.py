"""SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
deduplication of an embedding corpus — cluster vectors, then within each
cluster keep one representative per near-duplicate set (cosine ≥ τ).

Scale shape (the whole point of this module vs a naive self-join):

- **Assignment** is a broadcast cosine against a k-row centroid table —
  one shuffle keyed on ``vec_id``, never an all-pairs.
- **Within-cluster pruning** runs as a per-cluster numpy kernel under
  ``applyInPandas``: one shuffle keyed on ``cluster``, then an in-memory
  ``M @ M.T`` per group. No dim-exploded ``(cluster, i)`` self-join, so
  the shuffle volume is O(n·d) rows total, not O(Σ n_c²·d).
- **Cluster-size cap**: SemDeDup's published regime grows k ~ √n so
  per-cluster pair counts stay bounded. When a hot cluster still exceeds
  ``max_cluster_size``, the kernel deterministically REFINES it in-memory
  (tiny k-means seeded from evenly-spaced members, a few Lloyd rounds)
  and prunes within sub-clusters only — the same granularity-refinement
  trade the paper makes, applied adaptively. A 10^12-vector run is then
  bounded at O(n/k · max_cluster_size) pairwise work per task with no
  task ever materializing more than ``max_cluster_size²`` floats.

Reference parity: the reference repo has no embedding stage; this is an
LLM-training-data operator the brief adds on top (SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_clusters", "semdedup_flags", "semdedup_stats"]

DEFAULT_TAU = 0.97
DEFAULT_MAX_CLUSTER = 8192  # kernel refines clusters beyond this size


def assign_clusters(emb: DataFrame, *, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """(id, cluster) — nearest deterministic centroid by cosine.

    Codebook = per-label mean vectors (a deterministic stand-in for the
    paper's k-means; ``k = |labels|``). Centroids are tiny (k×d) and
    broadcast; assignment is a dim-exploded broadcast join aggregated
    back per id — one shuffle on ``id``. Cosine rounded to 6 dp, ties
    broken toward the greatest cluster id, so the assignment is
    reproducible across engines (matches the DuckDB oracle).
    """
    dims = emb.select(
        id_col, label_col, F.posexplode(vec_col).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = dims.groupBy(F.col(label_col).alias("c"), "i").agg(
        F.avg("v").alias("cv")
    )
    percos = (
        dims.join(F.broadcast(cent), "i")
        .groupBy(id_col, "c")
        .agg(
            F.sum(F.col("v") * F.col("cv")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("nv"),
            F.sum(F.col("cv") * F.col("cv")).alias("nc"),
        )
        .select(
            id_col,
            "c",
            F.round(F.col("dot") / (F.sqrt("nv") * F.sqrt("nc")), 6).alias(
                "cos"
            ),
        )
    )
    return (
        percos.groupBy(id_col)
        .agg(F.max(F.struct("cos", "c")).alias("m"))
        .select(id_col, F.col("m.c").alias("cluster"))
    )


def _refine(M: np.ndarray, n_sub: int, seed_ids: np.ndarray) -> np.ndarray:
    """Deterministic in-memory k-means refinement of one oversized
    cluster: seeds = evenly spaced members in id order (no RNG), 4 Lloyd
    rounds, cosine metric on L2-normalized rows. Returns sub-cluster
    labels."""
    n = M.shape[0]
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    U = M / norms
    seed_pos = np.linspace(0, n - 1, n_sub).round().astype(int)
    C = U[seed_pos].copy()
    lab = np.zeros(n, dtype=np.int64)
    for _ in range(4):
        sims = U @ C.T  # n × n_sub
        lab = sims.argmax(axis=1)
        for j in range(n_sub):
            members = U[lab == j]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                C[j] = m / nm if nm > 0 else C[j]
    return lab


def _prune_block(ids: np.ndarray, M: np.ndarray, tau: float) -> np.ndarray:
    """Boolean pruned-mask for one (sub-)cluster, ids ASC: row j is
    pruned iff some lower-id row i has round(cos(i,j), 6) ≥ τ — the
    keep-lowest-id rule the SQL oracle states as ``u < w``."""
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = 1.0
    S = np.round((M @ M.T) / np.outer(norms, norms), 6)
    hit = np.triu(S >= tau, k=1)  # strictly-upper: i < j positions only
    return hit.any(axis=0)


def semdedup_flags(emb: DataFrame, assign: DataFrame, *,
                   tau: float = DEFAULT_TAU,
                   max_cluster_size: int = DEFAULT_MAX_CLUSTER,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, pruned) — one row per vector.

    One shuffle on ``cluster``; each task runs the numpy kernel on its
    groups. Groups larger than ``max_cluster_size`` are refined in-memory
    first (``_refine``), bounding every ``M @ M.T`` at
    ``max_cluster_size²`` regardless of corpus size."""
    ev = emb.select(id_col, vec_col).join(assign, id_col)
    cluster_t = dict(assign.dtypes)["cluster"]
    id_t = dict(ev.dtypes)[id_col]
    out_schema = f"{id_col} {id_t}, cluster {cluster_t}, pruned boolean"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n = len(ids)
        pruned = np.zeros(n, dtype=bool)
        if n <= max_cluster_size:
            pruned = _prune_block(ids, M, tau)
        else:
            n_sub = -(-n // max_cluster_size)  # ceil
            lab = _refine(M, n_sub, ids)
            for j in np.unique(lab):
                sel = lab == j
                pruned[sel] = _prune_block(ids[sel], M[sel], tau)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": pdf["cluster"].to_numpy(),
                "pruned": pruned,
            }
        )

    return ev.groupBy("cluster").applyInPandas(kernel, out_schema)


def semdedup_stats(flags: DataFrame) -> DataFrame:
    """Per-cluster (n_vectors, n_pruned, n_kept) rollup of the flags."""
    return flags.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("pruned").cast("bigint")).alias("n_pruned"),
        F.sum((~F.col("pruned")).cast("bigint")).alias("n_kept"),
    )
