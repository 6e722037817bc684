"""Banded Hamming near-dup join (functions/hamming.py): exact recall vs
brute force, negative-key band extraction, hot-bucket cap semantics."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from aws_medallion_datalake_spark.functions.hamming import (
    band_values,
    hamming_candidates,
    hamming_pairs,
)

SCHEMA = "id string, key long"


def _flip(key: int, bits) -> int:
    for b in bits:
        key ^= 1 << b
    # wrap to signed int64
    key &= (1 << 64) - 1
    return key - (1 << 64) if key >= 1 << 63 else key


def _brute_pairs(rows, k):
    out = set()
    for (ia, ka), (ib, kb) in itertools.combinations(sorted(rows), 2):
        d = bin((ka ^ kb) & ((1 << 64) - 1)).count("1")
        if d <= k:
            out.add((ia, ib, d))
    return out


@pytest.fixture(scope="module")
def rows():
    rnd = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((f"d{i:03d}", rnd.getrandbits(64) - (1 << 63)))
    # planted near-dups of d000..d004: flips of 1-3 bits spanning bands
    base = dict(rows)
    for j, bits in enumerate([(0,), (17, 63), (3, 31, 49), (60,), (15, 16)]):
        rows.append((f"n{j:03d}", _flip(base[f"d{j:03d}"], bits)))
    return rows


def test_band_values_cover_all_64_bits(spark):
    df = spark.createDataFrame([("a", -1)], SCHEMA)
    vals = band_values(df, "id", "key").collect()
    assert len(vals) == 4
    assert all(r["v"] == 0xFFFF for r in vals)  # sign bit must not leak


def test_hamming_pairs_match_brute_force(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "key", max_distance=3).collect()
    }
    assert got == _brute_pairs(rows, 3)
    assert len(got) >= 5  # every planted pair found


def test_pigeonhole_guard(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_pairs(df, "id", "key", max_distance=4, n_bands=4)
    # distance 7 with 8x8-bit bands is still exact
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "key", 7, n_bands=8).collect()
    }
    assert got == _brute_pairs(rows, 7)


def test_hot_bucket_cap_drops_degenerate_clique(spark):
    # 50 identical keys (e.g. empty-doc simhash) + one true near-dup pair
    rows = [(f"z{i:03d}", 0) for i in range(50)]
    rows += [("a", 0x123456789ABCDEF0), ("b", 0x123456789ABCDEF1)]
    df = spark.createDataFrame(rows, SCHEMA)
    full = hamming_pairs(df, "id", "key", 2)
    assert full.count() == 50 * 49 // 2 + 1
    capped = hamming_pairs(df, "id", "key", 2, max_bucket=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {("a", "b")}  # clique gone, true pair survives


def test_candidates_are_distinct_and_bounded(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    cand = hamming_candidates(df, "id", "key")
    n = cand.count()
    assert n == cand.distinct().count()
    n_all_pairs = len(rows) * (len(rows) - 1) // 2
    assert n < n_all_pairs  # banding prunes vs all-pairs on random keys
