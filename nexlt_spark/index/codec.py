"""Delta + varint block codec for posting lists — numpy-vectorized.

The reference's postings are Lucene's (solrconfig.xml:151 codecFactory —
Lucene41 postings: FOR/varint blocks with skip data). We re-express the
same physical idea: docID-sorted posting lists cut into fixed-size
blocks (BLOCK_SIZE=128, the Lucene default), each block independently
decodable (doc_ids delta-encoded within the block), with per-block
max-score metadata for Block-Max WAND pruning (north_star).

Everything here is pure numpy (encode and decode are O(bytes) with no
per-value Python loops — the loops below are over the ≤10 byte positions
of a varint, not over values).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

BLOCK_SIZE = 128
_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    out = np.zeros((v.size, _MAX_VARINT_BYTES), dtype=np.uint8)
    nbytes = np.ones(v.size, dtype=np.int64)
    for i in range(_MAX_VARINT_BYTES):
        shifted = v >> np.uint64(7 * i)
        byte = (shifted & np.uint64(0x7F)).astype(np.uint8)
        more = (v >> np.uint64(7 * (i + 1))) > 0 if i + 1 < _MAX_VARINT_BYTES else np.zeros(v.size, bool)
        out[:, i] = byte | (more.astype(np.uint8) << 7)
        if i > 0:
            nbytes += (shifted > 0).astype(np.int64)
        if not more.any():
            break
    mask = np.arange(_MAX_VARINT_BYTES)[None, :] < nbytes[:, None]
    return out[mask].tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # group id per byte: 0-based index of the value it belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end)[:-1]
    n = int(is_end.sum())
    # position of each byte within its group
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(b.size) - starts[group]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, group, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64)))
    if count is not None:
        assert n == count, f"varint_decode: expected {count} values, got {n}"
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → [first, diffs…] (within one block)."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    out[1:] = a[1:] - a[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    tf_norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> List[Tuple[int, int, int, int, bytes, bytes, bytes, float]]:
    """One docID-sorted posting run → independent compressed blocks.

    Returns rows (block_id, n, first_doc_id, last_doc_id, doc_ids_enc,
    tfs_enc, dls_enc, max_tfnorm). tf_norms are the precomputed
    idf-independent per-posting score parts (see scoring.tf_norm); their
    block max becomes the BMW bound after multiplying by idf at query
    time.
    """
    n = len(doc_ids)
    rows = []
    for b, s in enumerate(range(0, n, block_size)):
        e = min(s + block_size, n)
        ids = np.asarray(doc_ids[s:e], dtype=np.uint64)
        rows.append(
            (
                b,
                e - s,
                int(ids[0]),
                int(ids[-1]),
                varint_encode(delta_encode(ids)),
                varint_encode(np.asarray(tfs[s:e], dtype=np.uint64)),
                varint_encode(np.asarray(dls[s:e], dtype=np.uint64)),
                float(np.max(tf_norms[s:e])),
            )
        )
    return rows


def decode_block(doc_ids_enc: bytes, tfs_enc: bytes, dls_enc: bytes, n: int):
    """One block row → (doc_ids, tfs, dls) numpy arrays."""
    ids = delta_decode(varint_decode(doc_ids_enc, n))
    tfs = varint_decode(tfs_enc, n)
    dls = varint_decode(dls_enc, n)
    return ids, tfs, dls
