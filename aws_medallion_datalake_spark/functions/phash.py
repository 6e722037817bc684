"""64-bit perceptual hash (average hash) over decoded pixels.

The clustering key source for Z-order/Hilbert clustering (SURVEY.md §2.10,
BASELINE.json north_star). Batch API for pandas UDFs: numpy throughout,
one Python iteration per image only because images vary in (w, h).
"""

from __future__ import annotations

import numpy as np

from .codec import decode_image


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8x8 block-mean grayscale, bit i set if cell > mean."""
    h, w, _ = img.shape
    gray = (
        img[:, :, 0].astype(np.float64) * 0.299
        + img[:, :, 1].astype(np.float64) * 0.587
        + img[:, :, 2].astype(np.float64) * 0.114
    )
    # Block-mean resize to 8x8 (integer bucket edges — deterministic).
    ye = np.linspace(0, h, 9).astype(np.int64)
    xe = np.linspace(0, w, 9).astype(np.int64)
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ye[i] : ye[i + 1], xe[j] : xe[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    val = np.uint64(0)
    for k in range(64):
        if bits[k]:
            val |= np.uint64(1) << np.uint64(63 - k)
    # Return as signed int64 (Spark LongType), two's complement.
    return int(val.astype(np.int64))


def phash_batch(payloads: "list[bytes]") -> np.ndarray:
    """Decode each payload and hash it; returns int64 array."""
    out = np.empty(len(payloads), dtype=np.int64)
    for i, p in enumerate(payloads):
        out[i] = ahash64(decode_image(p))
    return out
