"""Scan-equality verifier: the per-row correctness gate.

BASELINE.json north_star: "post-maintenance scans must match the reference
pipeline's output under snapshot isolation, with decoded pixels allclose
(PSNR ≥ 40 dB for lossy fmt) and byte-exact caption equality verified
per-row". This module implements that gate as one distributed plan:

  expected ⋈ actual on image_id (full outer to catch missing/extra rows)
  → caption byte-equality (native F.*, JVM-side)
  → payload byte-equality fast path; decode+PSNR (vectorized pandas UDF)
    only for rows whose bytes differ — at scale almost every row takes the
    fast path, so the Python boundary sees only the lossy tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import psnr_udf

PSNR_GATE_DB = 40.0


def scan_equality_report(expected: DataFrame, actual: DataFrame) -> dict:
    """Compare two image-table scans per-row; returns a metrics dict.

    PASS iff rows match 1:1 on image_id, captions are byte-equal, and
    pixels are byte-equal (png) or PSNR ≥ 40 dB (lossy re-encodes).
    """
    e = expected.select(
        F.col("image_id"),
        F.col("caption").alias("e_caption"),
        F.col("bytes").alias("e_bytes"),
    )
    a = actual.select(
        F.col("image_id"),
        F.col("caption").alias("a_caption"),
        F.col("bytes").alias("a_bytes"),
    )
    j = e.join(a, "image_id", "full_outer")
    bytes_equal = F.col("e_bytes") == F.col("a_bytes")
    j = j.select(
        "image_id",
        F.col("e_caption").isNull().alias("extra_row"),
        F.col("a_caption").isNull().alias("missing_row"),
        (F.col("e_caption") == F.col("a_caption")).alias("caption_ok"),
        bytes_equal.alias("bytes_ok"),
        # decode+PSNR only where BOTH payloads exist and differ (lossy path);
        # missing/extra rows already fail via the row-count columns.
        F.when(F.col("e_bytes").isNull() | F.col("a_bytes").isNull(), F.lit(None))
        .when(bytes_equal, F.lit(float("inf")))
        .otherwise(psnr_udf(F.col("e_bytes"), F.col("a_bytes")))
        .alias("psnr_db"),
    )
    agg = j.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("extra_row").cast("long")).alias("extra_rows"),
        F.sum(F.col("missing_row").cast("long")).alias("missing_rows"),
        # only rows present on both sides count as caption mismatches;
        # missing/extra rows are reported separately
        F.sum(F.when(F.col("caption_ok") == False, 1).otherwise(0)).alias(  # noqa: E712
            "caption_mismatches"
        ),
        F.sum((F.col("psnr_db") < PSNR_GATE_DB).cast("long")).alias("psnr_failures"),
        F.min("psnr_db").alias("min_psnr_db"),
        F.sum(F.col("bytes_ok").cast("long")).alias("byte_exact_rows"),
    ).first()
    report = {k: (None if agg[k] is None else float(agg[k])) for k in agg.asDict()}
    report["pass"] = (
        report["extra_rows"] == 0
        and report["missing_rows"] == 0
        and report["caption_mismatches"] == 0
        and report["psnr_failures"] == 0
    )
    return report
