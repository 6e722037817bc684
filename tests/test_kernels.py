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
