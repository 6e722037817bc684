"""Property-based tests (hypothesis) for the pure planner/kernel layer —
no SparkSession needed, so these run in milliseconds."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_medallion_datalake_spark.functions import zcurve
from aws_medallion_datalake_spark.functions.codec import (
    decode_image,
    encode_image,
    render_image,
)
from aws_medallion_datalake_spark.plans.binpack import plan_compaction

# ---------------------------------------------------------------------------
# zcurve kernels
# ---------------------------------------------------------------------------

dim21 = st.integers(min_value=0, max_value=(1 << 21) - 1)


@given(st.lists(st.tuples(dim21, dim21, dim21), min_size=1, max_size=64))
def test_morton_roundtrip(dims):
    a, b, c = (np.array(x, dtype=np.uint64) for x in zip(*dims))
    m = zcurve.interleave3(a, b, c)
    ra, rb, rc = zcurve.deinterleave3(m)
    assert (ra == a).all() and (rb == b).all() and (rc == c).all()


@given(st.lists(st.tuples(dim21, dim21, dim21), min_size=2, max_size=64))
def test_morton_msb_dominates(dims):
    """Keys sort primarily by the most-significant dim's bit prefix: if
    a1 and a2 differ in their top bit, morton order follows that bit."""
    a, b, c = (np.array(x, dtype=np.uint64) for x in zip(*dims))
    m = zcurve.interleave3(a, b, c)
    top = a >> np.uint64(20)
    for i in range(len(m)):
        for j in range(len(m)):
            if top[i] < top[j]:
                assert m[i] < m[j]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=1, max_value=4096),
            st.integers(min_value=1, max_value=4096),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_hilbert_and_morton_fit_int64(rows):
    ph, w, h = (np.array(x, dtype=np.int64) for x in zip(*rows))
    for fn in (zcurve.morton64, zcurve.hilbert64):
        k = fn(ph, w, h)
        assert k.dtype == np.int64
        assert (k >= 0).all()  # 63-bit keys never go negative


# ---------------------------------------------------------------------------
# bin-packing planner
# ---------------------------------------------------------------------------

TARGET = 1000


@st.composite
def manifests(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    sizes = draw(
        st.lists(
            st.integers(min_value=1, max_value=3 * TARGET), min_size=n, max_size=n
        )
    )
    parts = draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n)
    )
    return pd.DataFrame(
        {
            "path": [f"data/f{i}.parquet" for i in range(n)],
            "partition_json": parts,
            "file_size_bytes": sizes,
            "record_count": [10] * n,
        }
    )


@given(manifests())
@settings(max_examples=200)
def test_binpack_invariants(man):
    plan = plan_compaction(man, TARGET, min_input_files=2)
    seen = set()
    for g in plan.groups:
        # no file is rewritten twice
        assert not (set(g.paths) & seen)
        seen.update(g.paths)
        # groups never mix partitions
        rows = man[man["path"].isin(g.paths)]
        assert rows["partition_json"].nunique() == 1
        assert g.partition_json == rows["partition_json"].iloc[0]
        if g.kind == "pack":
            # packs combine >= 2 small files and never exceed the target
            assert len(g.paths) >= 2
            assert g.input_bytes <= TARGET
            assert (rows["file_size_bytes"] < TARGET * 0.75).all()
        else:
            # splits break one oversized file into >= 2 outputs
            assert len(g.paths) == 1 and g.n_output_files >= 2
            assert g.input_bytes > TARGET * 1.8
    # idempotence: a manifest of already-right-sized files plans nothing
    ok = man[
        (man["file_size_bytes"] >= TARGET * 0.75)
        & (man["file_size_bytes"] <= TARGET * 1.8)
    ]
    assert not plan_compaction(ok, TARGET).groups


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from([8, 16, 32, 48]),
    st.sampled_from([8, 16, 32]),
)
@settings(max_examples=50)
def test_png_roundtrip_byte_stable(seed, w, h):
    img = render_image(seed, w, h)
    p1 = encode_image(img, "png")
    p2 = encode_image(img, "png")
    assert p1 == p2  # byte-stable encode
    assert (decode_image(p1) == img).all()  # lossless roundtrip


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30)
def test_lossy_roundtrip_psnr(seed):
    from aws_medallion_datalake_spark.functions.codec import psnr

    img = render_image(seed, 32, 32)
    back = decode_image(encode_image(img, "jpeg"))
    assert psnr(img, back) >= 40.0


# ---------------------------------------------------------------------------
# hidden-partitioning transform derivation soundness (driver-side halves)
# ---------------------------------------------------------------------------
# Invariant: if a row value v satisfies the SOURCE predicate (col, op, x),
# then transform(v) must satisfy the DERIVED predicate — otherwise manifest
# pruning on the derived stats could drop a file holding a qualifying row.

from datetime import date as _date, timedelta as _td

from aws_medallion_datalake_spark.sources import transforms as _T


def _py_apply(t, v):
    """Driver-side value of the transform (mirrors Transform.expr())."""
    if t.kind == "bucket":
        return _T._bucket_py(v, t.param)
    if t.kind == "truncate":
        return str(v)[: t.param]
    d = _T._to_date(v)
    if t.kind == "days":
        return (d - _date(1970, 1, 1)).days
    if t.kind == "months":
        return (d.year - 1970) * 12 + d.month - 1
    return d.year - 1970


def _holds(op, v, x):
    if op == "=":
        return v == x
    if op == ">=":
        return v >= x
    if op == "<=":
        return v <= x
    return x[0] <= v <= x[1]  # between


_dates = st.dates(min_value=_date(1970, 1, 1), max_value=_date(2099, 12, 31))


@given(_dates, _dates, _dates, st.sampled_from(["days", "months", "years"]))
@settings(max_examples=200)
def test_date_transform_derivation_sound(v, lo, hi, kind):
    t = _T.parse(f"{kind}(d)")
    for op, x in [
        ("=", lo),
        (">=", lo),
        ("<=", hi),
        ("between", (min(lo, hi), max(lo, hi))),
    ]:
        d = t.derive(op, x if op != "between" else tuple(map(str, x)))
        assert d is not None
        if _holds(op, v, x if op != "between" else (min(lo, hi), max(lo, hi))):
            _, dop, dx = d
            assert _holds(dop, _py_apply(t, v), dx)


@given(st.text(min_size=0, max_size=12), st.text(min_size=0, max_size=12),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=200)
def test_truncate_derivation_sound(v, x, n):
    t = _T.parse(f"truncate({n}, s)")
    for op in ("=", ">=", "<="):
        d = t.derive(op, x)
        if _holds(op, v, x):
            _, dop, dx = d
            assert _holds(dop, _py_apply(t, v), dx)


@given(st.one_of(st.text(max_size=16), st.integers(-10**9, 10**9)),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=200)
def test_bucket_derivation_sound(x, n):
    t = _T.parse(f"bucket({n}, k)")
    d = t.derive("=", x)
    assert d == (t.name, "=", _T._bucket_py(x, n))
    assert 0 <= d[2] < n
    # bucket cannot prune ranges — derivation must refuse, not guess
    assert t.derive(">=", x) is None and t.derive("<=", x) is None
