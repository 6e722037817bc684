"""SemDeDup operator: per-cluster numpy kernel equivalence with the SQL
all-pairs rule, the cluster-size cap, and determinism."""

import numpy as np
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.operators.semdedup import (
    assign_clusters,
    semdedup_flags,
    semdedup_stats,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _flag_map(df):
    return {r["vec_id"]: r["pruned"] for r in df.collect()}


def test_kernel_matches_allpairs_rule(spark):
    """The numpy kernel reproduces the declarative rule: w pruned iff
    some u < w in the same cluster has round(cos, 6) >= tau."""
    e = _emb(spark)
    assign = assign_clusters(e)
    tau = 0.35  # sf0.001 max pairwise cos ~0.48 — low tau to exercise pruning
    got = _flag_map(semdedup_flags(e, assign, tau=tau))
    rows = (
        e.join(assign, "vec_id")
        .select("vec_id", "cluster", "embedding")
        .collect()
    )
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    ref = {}
    for members in by_cluster.values():
        members.sort()
        for j, (wid, wv) in enumerate(members):
            pruned = False
            for uid, uv in members[:j]:
                c = float(uv @ wv) / (
                    np.linalg.norm(uv) * np.linalg.norm(wv)
                )
                if round(c, 6) >= tau:
                    pruned = True
                    break
            ref[wid] = pruned
    assert got == ref
    assert any(got.values())  # the fixture does contain near-dups


def test_cluster_size_cap_bounds_pairwise_work(spark):
    """With a tiny max_cluster_size every kernel block is refined; the
    result is still a sound pruning: refined-pruned is a subset of the
    uncapped pruning (sub-clusters only remove candidate pairs), every
    vector is flagged exactly once, and stats add up."""
    e = _emb(spark)
    assign = assign_clusters(e)
    full = _flag_map(semdedup_flags(e, assign, tau=0.35))
    capped_df = semdedup_flags(e, assign, tau=0.35, max_cluster_size=8)
    capped = _flag_map(capped_df)
    assert set(capped) == set(full)
    pruned_capped = {k for k, v in capped.items() if v}
    pruned_full = {k for k, v in full.items() if v}
    assert pruned_capped <= pruned_full
    stats = semdedup_stats(capped_df)
    r = stats.agg(
        F.sum("n_vectors").alias("nv"),
        F.sum(F.col("n_pruned") + F.col("n_kept")).alias("pk"),
    ).first()
    assert r["nv"] == r["pk"] == e.count()


def test_deterministic(spark):
    e = _emb(spark)
    assign = assign_clusters(e)
    a = _flag_map(semdedup_flags(e, assign, max_cluster_size=16))
    b = _flag_map(semdedup_flags(e, assign, max_cluster_size=16))
    assert a == b
