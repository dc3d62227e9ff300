"""Codec property tests (FIXTURES.md §5) — hypothesis-style seeded."""

import numpy as np
import pytest

from nexlt_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
)
from nexlt_spark.scoring import tf_norm


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 1000, 10000])
def test_varint_roundtrip(n):
    rng = np.random.default_rng(n + 7)
    for scale in [1, 2**7, 2**14, 2**31, 2**53]:
        vals = rng.integers(0, scale, size=n, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals), n), vals)


def test_varint_boundaries():
    vals = np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**31, 2**53, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals), len(vals)), vals)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 10000])
def test_delta_roundtrip(n):
    rng = np.random.default_rng(n)
    gaps = rng.integers(1, 2**31, size=n, dtype=np.uint64)
    ids = np.cumsum(gaps, dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


@pytest.mark.parametrize("n", [1, 127, 128, 129, 513, 5000])
def test_block_roundtrip_and_blockmax(n):
    rng = np.random.default_rng(n * 3 + 1)
    gaps = rng.integers(1, 1000, size=n, dtype=np.uint64)
    ids = np.cumsum(gaps, dtype=np.uint64)
    tfs = rng.integers(1, 50, size=n, dtype=np.uint64)
    dls = rng.integers(1, 500, size=n, dtype=np.uint64)
    avgdl = 57.3
    tfn = np.array([tf_norm(float(t), float(d), avgdl) for t, d in zip(tfs, dls)])
    rows = encode_blocks(ids, tfs, dls, tfn)
    assert len(rows) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    got_ids, got_tfs, got_dls = [], [], []
    for block_id, bn, first, last, e_ids, e_tfs, e_dls, maxtfn in rows:
        bids, btfs, bdls = decode_block(e_ids, e_tfs, e_dls, bn)
        assert bids[0] == first and bids[-1] == last
        # block max == true max of exact per-posting score parts
        bmax = max(tf_norm(float(t), float(d), avgdl) for t, d in zip(btfs, bdls))
        assert maxtfn == pytest.approx(bmax, rel=0, abs=0)
        got_ids.append(bids)
        got_tfs.append(btfs)
        got_dls.append(bdls)
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    assert np.array_equal(np.concatenate(got_dls), dls)


def test_compression_is_effective():
    ids = np.arange(1, 100001, dtype=np.uint64) * 3  # small gaps
    enc = varint_encode(delta_encode(ids))
    assert len(enc) < len(ids) * 2  # ≤2 bytes/posting vs 8 raw
