"""Pure-numpy kernel tests (no Spark): codec, phash, Morton/Hilbert."""

import numpy as np
import pytest

from aws_medallion_datalake_spark.functions import zcurve
from aws_medallion_datalake_spark.functions.codec import (
    decode_image,
    decode_lossy,
    decode_png,
    encode_image,
    encode_lossy,
    encode_png,
    psnr,
    render_image,
)
from aws_medallion_datalake_spark.functions.phash import ahash64, phash_batch


def test_png_roundtrip_byte_exact():
    img = render_image(42, 64, 48)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png(data)
    np.testing.assert_array_equal(img, back)
    # byte-stable re-encode (fixture requirement: PNG rows round-trip stable)
    assert encode_png(back) == data


def _independent_png_decode(data: bytes) -> np.ndarray:
    """From-scratch PNG reader written AGAINST THE SPEC (RFC 2083), not
    against our encoder: walks chunks verifying each CRC, validates the
    IHDR fields, inflates the concatenated IDAT stream with stdlib zlib,
    and reconstructs scanlines implementing ALL FIVE filter types
    (None/Sub/Up/Average/Paeth — the engine only writes filter 0, but a
    spec decoder must not assume that). Interop evidence for the codec's
    "readable by any standard PNG tool" claim (functions/codec.py:8-10)
    without an external image library in the container."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad signature"
    pos, chunks = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(ctype + body) & 0xFFFFFFFF == crc, f"bad CRC in {ctype}"
        chunks.append((ctype, body))
        pos += 12 + length
    assert chunks[0][0] == b"IHDR" and chunks[-1][0] == b"IEND"
    w, h, depth, ctype_v, comp, filt, inter = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    assert depth == 8 and ctype_v == 2, "8-bit RGB expected"
    assert comp == 0 and filt == 0 and inter == 0
    raw = zlib.decompress(b"".join(b for t, b in chunks if t == b"IDAT"))
    stride = w * 3
    assert len(raw) == h * (1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)], dtype=np.uint8
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0  # left
            b = prev[x]  # up
            c = prev[x - bpp] if x >= bpp else 0  # upper-left
            if ftype == 0:
                rec = line[x]
            elif ftype == 1:
                rec = line[x] + a
            elif ftype == 2:
                rec = line[x] + b
            elif ftype == 3:
                rec = line[x] + (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec = line[x] + pred
            else:
                raise AssertionError(f"unknown filter {ftype}")
            cur[x] = rec & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


def test_png_interop_independent_spec_decoder():
    """An engine-written PNG decodes pixel-exact through a decoder that
    shares no code with the codec — chunk/CRC/IHDR validation + zlib
    inflate + full five-filter reconstruction per the PNG spec."""
    img = render_image(99, 40, 31)  # non-multiple-of-8 dims on purpose
    data = encode_png(img)
    np.testing.assert_array_equal(_independent_png_decode(data), img)
    # the independent decoder also validates structure: corrupting one
    # payload byte must break that chunk's CRC
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises(AssertionError, match="CRC"):
        _independent_png_decode(bytes(bad))


def test_lossy_roundtrip_psnr_above_40db():
    img = render_image(7, 96, 128)
    back = decode_lossy(encode_lossy(img))
    assert psnr(img, back) >= 40.0
    assert np.abs(img.astype(int) - back.astype(int)).max() <= 3


def test_render_deterministic():
    a = render_image(123, 32, 32)
    b = render_image(123, 32, 32)
    c = render_image(124, 32, 32)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_decode_dispatch():
    img = render_image(1, 32, 32)
    np.testing.assert_array_equal(decode_image(encode_image(img, "png")), img)
    assert psnr(img, decode_image(encode_image(img, "jpeg"))) >= 40.0
    with pytest.raises(ValueError):
        decode_image(b"garbage-payload")


def test_phash_locality_and_determinism():
    img = render_image(5, 64, 64)
    h1 = ahash64(img)
    assert h1 == ahash64(render_image(5, 64, 64))
    # lossy re-encode should barely move the hash (hamming distance small)
    h2 = ahash64(decode_lossy(encode_lossy(img)))
    assert bin(np.uint64(h1).view(np.uint64) ^ np.int64(h2).view(np.uint64)).count("1") <= 4
    # different image → different hash (overwhelmingly)
    assert h1 != ahash64(render_image(900001, 64, 64))


def test_phash_batch_matches_scalar():
    payloads = [encode_image(render_image(i, 32, 32), "png") for i in range(5)]
    batch = phash_batch(payloads)
    for i, p in enumerate(payloads):
        assert batch[i] == ahash64(decode_image(p))


def test_morton_interleave_roundtrip():
    rng = np.random.default_rng(42)
    a = rng.integers(0, 1 << 21, 1000, dtype=np.uint64)
    b = rng.integers(0, 1 << 21, 1000, dtype=np.uint64)
    c = rng.integers(0, 1 << 21, 1000, dtype=np.uint64)
    m = zcurve.interleave3(a, b, c)
    ra, rb, rc = zcurve.deinterleave3(m)
    np.testing.assert_array_equal(a, ra)
    np.testing.assert_array_equal(b, rb)
    np.testing.assert_array_equal(c, rc)


def test_morton_known_vectors():
    # interleave3(a,b,c) = a most significant: (1,0,0)->0b100, (0,1,0)->0b010, (0,0,1)->0b001
    one = np.array([1], dtype=np.uint64)
    zero = np.array([0], dtype=np.uint64)
    assert int(zcurve.interleave3(one, zero, zero)[0]) == 4
    assert int(zcurve.interleave3(zero, one, zero)[0]) == 2
    assert int(zcurve.interleave3(zero, zero, one)[0]) == 1
    assert int(zcurve.interleave3(one, one, one)[0]) == 7


def test_hilbert_roundtrip():
    rng = np.random.default_rng(7)
    for bits in (2, 5, 21):
        hi = 1 << bits
        a = rng.integers(0, hi, 500, dtype=np.uint64)
        b = rng.integers(0, hi, 500, dtype=np.uint64)
        c = rng.integers(0, hi, 500, dtype=np.uint64)
        d = zcurve.hilbert_index3(a, b, c, bits)
        ra, rb, rc = zcurve.hilbert_point3(d, bits)
        np.testing.assert_array_equal(a, ra)
        np.testing.assert_array_equal(b, rb)
        np.testing.assert_array_equal(c, rc)


def test_hilbert_adjacency():
    """Consecutive Hilbert indices differ by exactly 1 in exactly one axis."""
    bits = 4
    n = (1 << bits) ** 3
    d = np.arange(n, dtype=np.uint64)
    xs = np.stack(zcurve.hilbert_point3(d, bits)).astype(np.int64)
    step = np.abs(np.diff(xs, axis=1)).sum(axis=0)
    assert (step == 1).all()
    # and the curve visits every cell exactly once
    flat = xs[0] * (1 << (2 * bits)) + xs[1] * (1 << bits) + xs[2]
    assert len(np.unique(flat)) == n


def test_hilbert_fits_int64():
    p = np.array([np.iinfo(np.int64).min, -1, 0, np.iinfo(np.int64).max])
    w = np.array([1 << 20] * 4)
    h = np.array([(1 << 21) - 1] * 4)
    for fn in (zcurve.morton64, zcurve.hilbert64):
        k = fn(p, w, h)
        assert k.dtype == np.int64
        assert (k >= 0).all()
