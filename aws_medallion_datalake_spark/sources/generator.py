"""Deterministic synthetic image+caption source.

Replaces the reference's REST-API bronze ingestion (SURVEY.md §2.1 S1,
/root/reference/scripts/bronze_digit.py:28-109) with a seeded generator —
no external data is allowed. Shape is exactly BASELINE.json ``input_hint``:

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

plus an ``ingest_date`` partition column mirroring the reference's
``year=/month=/day=`` hive layout (scripts/bronze_digit.py:143-148),
collapsed to a single date string column for the fixture scale.

Generation runs distributed: ``spark.range(n)`` → ``mapInPandas`` (Arrow
batches; numpy rendering + codec per FIXTURES.md §1). Every property of row
``i`` is a pure function of ``i``, so any executor regenerates identical
bytes — the basis for byte-exact PNG fixtures and the MERGE oracle.

Skew (FIXTURES.md §1 phash row): rows with ``i % 10 == 0`` render one of 4
hot base patterns, so ~10% of rows collapse into 4 phash hot buckets —
exercising the cluster per-row key salt and MERGE's AQE skew handling.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.codec import decode_image, encode_image, render_image
from ..functions.phash import ahash64

COLORS = ["red", "amber", "green", "cyan", "blue", "violet", "gray", "teal"]
SHAPES = ["stripe", "wave", "grid", "spiral", "blob", "checker"]
WIDTHS = [32, 64, 96, 128]
HEIGHTS = [32, 48, 64, 128]
N_HOT = 4  # hot phash buckets

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, ingest_date string"
)
UPDATE_SALT = 7_777_777  # seed offset for MERGE-source re-encoded rows


def row_props(i: int, n_dates: int = 4) -> dict:
    """Pure-function properties of row i (shared by generator and oracles)."""
    w = WIDTHS[i % 4]
    h = HEIGHTS[(i // 4) % 4]
    fmt = "jpeg" if i % 5 == 0 else "png"
    seed = (i % N_HOT) if i % 10 == 0 else i + 1000  # hot tail ≈10%
    return {
        "image_id": f"img-{i:012d}",
        "w": w,
        "h": h,
        "fmt": fmt,
        "seed": seed,
        "caption": f"a {COLORS[i % 8]} {SHAPES[i % 6]} pattern #{i}",
        "ingest_date": f"2024-01-{(i % n_dates) + 1:02d}",
    }


def make_row(i: int, n_dates: int = 4, seed_offset: int = 0) -> dict:
    p = row_props(i, n_dates)
    img = render_image(p.pop("seed") + seed_offset, p["w"], p["h"])
    payload = encode_image(img, p["fmt"])
    # phash is computed from the STORED pixels (post-codec), so lossy rows
    # hash what a reader will actually decode.
    p["bytes"] = payload
    p["phash"] = ahash64(decode_image(payload))
    return p


def _gen_batches(it: Iterator[pd.DataFrame], n_dates: int, seed_offset: int):
    for pdf in it:
        rows = [make_row(int(i), n_dates, seed_offset) for i in pdf["id"]]
        out = pd.DataFrame(rows)
        yield out[
            ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ingest_date"]
        ]


def generate_images(
    spark: SparkSession,
    n_rows: int,
    *,
    n_files: int = 32,
    n_dates: int = 4,
    start: int = 0,
    seed_offset: int = 0,
) -> DataFrame:
    """Distributed deterministic image table; `n_files` controls output
    parallelism (many small partitions ⇒ the compaction workload)."""
    base = spark.range(start, start + n_rows, 1, n_files)

    def gen(it):
        return _gen_batches(it, n_dates, seed_offset)

    return base.mapInPandas(gen, schema=SCHEMA)


def generate_updates(
    spark: SparkSession,
    n_target_rows: int,
    n_updates: int,
    n_inserts: int,
    *,
    n_files: int = 16,
    n_dates: int = 4,
) -> DataFrame:
    """MERGE source per FIXTURES.md §2 `images_updates`.

    - updates: ids sampled from the target's LOW id range with a stride that
      over-represents the hot-phash rows (i % 10 == 0), new caption +
      re-encoded bytes (seed_offset shifts the pixels).
    - inserts: fresh ids beyond the target range.
    """
    upd = generate_images(
        spark,
        n_updates,
        n_files=max(1, n_files // 2),
        n_dates=n_dates,
        start=0,
        seed_offset=UPDATE_SALT,
    ).withColumn("caption", F_concat_caption())
    ins = generate_images(
        spark,
        n_inserts,
        n_files=max(1, n_files // 2),
        n_dates=n_dates,
        start=n_target_rows,
    )
    return upd.unionByName(ins)


def F_concat_caption():
    from pyspark.sql import functions as F

    return F.concat(F.col("caption"), F.lit(" (rev2)"))
