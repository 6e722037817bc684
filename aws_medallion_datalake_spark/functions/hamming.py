"""Banded Hamming-distance near-duplicate join over 64-bit fingerprints.

The missing half of a fingerprint dedup pipeline: SimHash / phash give
every record a 64-bit signature whose Hamming distance tracks content
similarity, but finding all pairs within distance k naively is an O(n²)
all-pairs join — unusable at 10^12 rows. This module implements the
standard pigeonhole banding trick (Manku et al., "Detecting
Near-Duplicates for Web Crawling", WWW'07 — the Google SimHash paper):

  split the 64-bit key into ``n_bands`` contiguous bit bands. If two
  keys differ in at most ``max_distance`` bits and
  ``n_bands >= max_distance + 1``, at least one band is IDENTICAL
  (pigeonhole), so every true near-dup pair collides in some band
  bucket. Candidates = pairs sharing any band value; the exact Hamming
  check then filters false positives.

Spark shape (all JVM-side, no Python in the hot path):

  keys → posexplode band values → self-join on (band, value) →
  distinct (a, b) pairs → filter bit_count(a XOR b) <= k

The self-join shuffles on (band, value) — the natural partitioning key
— and each bucket's pair blow-up is local to its partition. Hot buckets
(e.g. the degenerate all-zero simhash of empty docs, or a planted
hot-phash tail) emit |bucket|² candidates; ``max_bucket`` drops band
values shared by more than that many records, the same
document-frequency cap as the shingle inverted index
(``__spark_entry__.q_ngram_jaccard_pairs``). Dropping a bucket
sacrifices the recall guarantee only for pairs whose OTHER agreeing
bands are also hot — at web scale those are boilerplate/degenerate
records that exact dedup already caught.

Reference anchor: the reference pipeline has no near-dup stage at all
(its silver dedup is exact drop-duplicates,
/root/reference/scripts/silver_digit_clean.py:96); this is north_star
scope — the operator an image+caption training-data lakehouse runs
after exact dedup.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["band_values", "hamming_candidates", "hamming_pairs"]


def band_values(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """(id, key, band, v): one row per (record, band). ``v`` is the
    band's bit slice as a non-negative long (shiftrightunsigned so the
    sign bit of a two's-complement int64 key never leaks into lower
    bands)."""
    if n_bands * band_bits > 64:
        raise ValueError(f"{n_bands} bands x {band_bits} bits exceeds 64")
    mask = F.lit((1 << band_bits) - 1)
    vals = F.array(
        *[
            F.shiftrightunsigned(F.col(key_col), i * band_bits).bitwiseAND(mask)
            for i in range(n_bands)
        ]
    )
    return df.select(
        F.col(id_col), F.col(key_col), F.posexplode(vals).alias("band", "v")
    )


def hamming_candidates(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    n_bands: int = 4,
    band_bits: int = 16,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a, key_a, id_b, key_b) colliding in
    >= 1 band. ``max_bucket`` drops (band, v) buckets holding more than
    that many records (hot-bucket quadratic guard — see module doc)."""
    b = band_values(df, id_col, key_col, n_bands=n_bands, band_bits=band_bits)
    if max_bucket is not None:
        hot = (
            b.groupBy("band", "v")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "v")
        )
        b = b.join(F.broadcast(hot), ["band", "v"], "left_anti")
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{key_col}").alias("key_b"),
        )
        .distinct()
    )


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_distance: int,
    *,
    n_bands: Optional[int] = None,
    band_bits: Optional[int] = None,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """All pairs with Hamming(key_a, key_b) <= max_distance, found via
    banding (exact recall when ``max_bucket`` is None — pigeonhole
    needs n_bands >= max_distance + 1, enforced here). Returns
    (id_a, id_b, hamming:long), id_a < id_b."""
    if n_bands is None:
        n_bands = max(max_distance + 1, 4)
    if n_bands <= max_distance:
        raise ValueError(
            f"pigeonhole needs n_bands > max_distance ({n_bands} <= {max_distance})"
        )
    if band_bits is None:
        band_bits = 64 // n_bands
    cand = hamming_candidates(
        df, id_col, key_col,
        n_bands=n_bands, band_bits=band_bits, max_bucket=max_bucket,
    )
    dist = F.bit_count(F.col("key_a").bitwiseXOR(F.col("key_b")))
    return (
        cand.withColumn("hamming", dist.cast("long"))
        .filter(F.col("hamming") <= max_distance)
        .select(
            F.col("id_a").alias(f"{id_col}_a"),
            F.col("id_b").alias(f"{id_col}_b"),
            "hamming",
        )
    )
