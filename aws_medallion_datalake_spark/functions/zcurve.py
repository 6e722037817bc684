"""64-bit Morton (Z-order) and Hilbert clustering keys over (phash, w, h).

Vectorized numpy bit arithmetic for use inside pandas UDFs (BASELINE.json
north_star: "Z-order and Hilbert-curve clustering via 64-bit Morton/Hilbert
key interleave over (phash, w, h)").  3 dims × 21 bits = 63-bit keys, so the
result always fits a signed Spark LongType without overflow.

Hilbert uses Skilling's public-domain transpose algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004), vectorized with numpy masks.
"""

from __future__ import annotations

import numpy as np

BITS = 21  # per-dimension bits; 3*21 = 63 ≤ 63 usable bits of int64
_DIM_MASK = np.uint64((1 << BITS) - 1)


def _spread3(x: np.ndarray) -> np.ndarray:
    """Insert two zero bits between each of the low 21 bits (uint64)."""
    x = x.astype(np.uint64) & _DIM_MASK
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def _unspread3(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x1249249249249249)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x >> np.uint64(32))) & _DIM_MASK
    return x


def interleave3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Morton-interleave three 21-bit dims, `a` most significant."""
    return (_spread3(a) << np.uint64(2)) | (_spread3(b) << np.uint64(1)) | _spread3(c)


def deinterleave3(m: np.ndarray):
    m = m.astype(np.uint64)
    return (
        _unspread3(m >> np.uint64(2)),
        _unspread3(m >> np.uint64(1)),
        _unspread3(m),
    )


def _norm_dims(phash: np.ndarray, w: np.ndarray, h: np.ndarray):
    """Map (phash int64, w, h) into three 21-bit unsigned dims.

    phash: flip the sign bit (order-preserving signed→unsigned map, the
    same trick Iceberg's z-order uses for signed ints) then keep the TOP
    21 bits — so curve order agrees with SIGNED phash order and no range
    bucket ever straddles the ±2^63 boundary (a straddling file reports
    min≈-2^63 / max≈+2^63 and defeats signed min/max pruning). w/h:
    clamped to 21 bits.
    """
    p = (
        np.asarray(phash).astype(np.int64).view(np.uint64)
        ^ np.uint64(1 << 63)
    ) >> np.uint64(64 - BITS)
    wq = np.asarray(w).astype(np.uint64) & _DIM_MASK
    hq = np.asarray(h).astype(np.uint64) & _DIM_MASK
    return p, wq, hq


def morton64(phash: np.ndarray, w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Z-order key; int64, always non-negative (63 bits)."""
    p, wq, hq = _norm_dims(phash, w, h)
    return interleave3(p, wq, hq).astype(np.int64)


# --- Hilbert (Skilling transpose), n=3 dims, BITS bits --------------------


def _axes_to_transpose(X: "list[np.ndarray]", bits: int) -> "list[np.ndarray]":
    n = len(X)
    X = [x.astype(np.uint64).copy() for x in X]
    M = np.uint64(1) << np.uint64(bits - 1)
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            mask = (X[i] & Q) != 0
            t = np.where(mask, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] = np.where(mask, X[0] ^ P, X[0] ^ t)
            X[i] = X[i] ^ t
        Q >>= np.uint64(1)
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    return [x ^ t for x in X]


def _transpose_to_axes(X: "list[np.ndarray]", bits: int) -> "list[np.ndarray]":
    n = len(X)
    X = [x.astype(np.uint64).copy() for x in X]
    Z = np.uint64(2) << np.uint64(bits - 1)
    t = X[n - 1] >> np.uint64(1)
    for i in range(n - 1, 0, -1):
        X[i] = X[i] ^ X[i - 1]
    X[0] = X[0] ^ t
    Q = np.uint64(2)
    while Q != Z:
        P = Q - np.uint64(1)
        for i in range(n - 1, -1, -1):
            mask = (X[i] & Q) != 0
            t = np.where(mask, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] = np.where(mask, X[0] ^ P, X[0] ^ t)
            X[i] = X[i] ^ t
        Q <<= np.uint64(1)
    return X


def hilbert_index3(a: np.ndarray, b: np.ndarray, c: np.ndarray, bits: int = BITS) -> np.ndarray:
    """Hilbert distance of 3-D points (uint64 coords, `bits` bits each)."""
    T = _axes_to_transpose([np.asarray(a), np.asarray(b), np.asarray(c)], bits)
    return interleave3(T[0], T[1], T[2])


def hilbert_point3(d: np.ndarray, bits: int = BITS):
    """Inverse of :func:`hilbert_index3` (used by tests)."""
    t0, t1, t2 = deinterleave3(np.asarray(d))
    return tuple(_transpose_to_axes([t0, t1, t2], bits))


def hilbert64(phash: np.ndarray, w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Hilbert clustering key over (phash, w, h); int64, non-negative."""
    p, wq, hq = _norm_dims(phash, w, h)
    return hilbert_index3(p, wq, hq).astype(np.int64)
