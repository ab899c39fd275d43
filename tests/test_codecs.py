"""Posting codec round-trip + block-max property tests (SURVEY.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_ray.codecs import (
    BLOCK,
    decode_block,
    decode_postings,
    encode_postings,
    tf_saturation,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = vb_encode(arr)
    out, consumed = vb_decode(buf, len(arr))
    assert consumed == len(buf)
    assert (out == arr).all()


def test_varbyte_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, (1 << 63) - 1], dtype=np.uint64)
    buf = vb_encode(vals)
    out, _ = vb_decode(buf, len(vals))
    assert (out == vals).all()
    assert len(vb_encode(np.array([127], dtype=np.uint64))) == 1
    assert len(vb_encode(np.array([128], dtype=np.uint64))) == 2


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_varbyte_concat_streams(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 40, 17).astype(np.uint64)
    b = rng.integers(0, 1 << 40, 13).astype(np.uint64)
    buf = np.concatenate([vb_encode(a), vb_encode(b)])
    da, c1 = vb_decode(buf, len(a))
    db, _ = vb_decode(buf, len(b), start=c1)
    assert (da == a).all() and (db == b).all()


@pytest.mark.parametrize("n", [1, 2, BLOCK - 1, BLOCK, BLOCK + 1, 3 * BLOCK + 7])
@pytest.mark.parametrize("idspace", [1 << 62, 10_000])  # wide + dense-ordinal (fast path)
def test_postings_roundtrip(n, idspace):
    rng = np.random.default_rng(n)
    ids = np.sort(rng.choice(max(idspace, n + 1), size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 200, n)
    dls = rng.integers(1, 4000, n)
    blob, meta = encode_postings(ids, tfs, dls, avgdl=150.0)
    d, t = decode_postings(blob, meta)
    assert (d == ids.astype(np.int64)).all()
    assert (t == tfs).all()
    assert meta.df == n and meta.cf == tfs.sum()
    for i in range(len(meta.block_count)):
        bd, bt = decode_block(blob, meta, i)
        lo, hi = i * BLOCK, min((i + 1) * BLOCK, n)
        assert (bd == ids[lo:hi].astype(np.int64)).all()
        sat = tf_saturation(tfs[lo:hi], dls[lo:hi], 150.0)
        assert float(meta.block_max_tfsat[i]) >= sat.max()  # safe upper bound


def test_unsorted_postings_rejected():
    ids = np.array([5, 3], dtype=np.uint64)
    with pytest.raises(ValueError):
        encode_postings(ids, np.array([1, 1]), np.array([1, 1]), 1.0)


@given(st.integers(min_value=1, max_value=1200), st.integers(min_value=0, max_value=5))
@settings(max_examples=60, deadline=None)
def test_block_range_roundtrip(n, seed):
    from splade_ray.codecs import decode_block_range

    rng = np.random.default_rng(seed * 7919 + n)
    ids = np.sort(rng.choice(n * 50 + 10, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 99, n)
    dls = rng.integers(1, 3000, n)
    blob, meta = encode_postings(ids, tfs, dls, avgdl=100.0)
    n_blocks = len(meta.block_count)
    # every contiguous [lo, hi) range decodes exactly like a full-decode slice
    for lo in range(n_blocks):
        for hi in range(lo, n_blocks + 1):
            d, t = decode_block_range(blob, meta, lo, hi)
            plo, phi = lo * BLOCK, min(hi * BLOCK, n)
            assert (d == ids[plo:phi].astype(np.int64)).all()
            assert (t == tfs[plo:phi]).all()
