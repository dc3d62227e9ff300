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


def _varint_width(v: np.ndarray) -> int:
    """Bytes needed by the widest value: ⌈bit_length/7⌉ (≥1). Sizing the
    work matrix to the ACTUAL width instead of the 10-byte worst case is
    the codec's main allocation cut — tf/dl streams are 1-2 bytes wide,
    doc-delta streams 1-4, so the zeros+mask traffic shrinks 3-10×
    (encode-phase scaling, BENCH.md §5)."""
    mx = int(v.max())
    return max(1, (mx.bit_length() + 6) // 7)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    w = _varint_width(v)
    if w == 1:
        return v.astype(np.uint8).tobytes()  # every value < 128: identity
    out = np.empty((v.size, w), dtype=np.uint8)
    nbytes = np.ones(v.size, dtype=np.int64)
    for i in range(w):
        shifted = v >> np.uint64(7 * i)
        byte = (shifted & np.uint64(0x7F)).astype(np.uint8)
        more = (v >> np.uint64(7 * (i + 1))) > 0 if i + 1 < w else np.zeros(v.size, bool)
        out[:, i] = byte | (more.astype(np.uint8) << 7)
        if i > 0:
            nbytes += (shifted > 0).astype(np.int64)
    mask = np.arange(w)[None, :] < nbytes[:, None]
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


def _varint_encode_with_offsets(values: np.ndarray) -> Tuple[bytes, np.ndarray]:
    """LEB128-encode the whole array in ONE vectorized pass; also return
    per-value byte offsets (length n+1) so callers can slice the buffer
    at arbitrary value boundaries. Byte-identical to varint_encode."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    w = _varint_width(v)
    if w == 1:
        return v.astype(np.uint8).tobytes(), np.arange(v.size + 1, dtype=np.int64)
    out = np.empty((v.size, w), dtype=np.uint8)
    nbytes = np.ones(v.size, dtype=np.int64)
    for i in range(w):
        shifted = v >> np.uint64(7 * i)
        byte = (shifted & np.uint64(0x7F)).astype(np.uint8)
        more = (v >> np.uint64(7 * (i + 1))) > 0 if i + 1 < w else np.zeros(v.size, bool)
        out[:, i] = byte | (more.astype(np.uint8) << 7)
        if i > 0:
            nbytes += (shifted > 0).astype(np.int64)
    mask = np.arange(w)[None, :] < nbytes[:, None]
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    return out[mask].tobytes(), offsets


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

    Fully vectorized ACROSS blocks: deltas computed array-wide with a
    restart (absolute docID) at each block boundary, all three varint
    streams encoded in one pass each, per-block byte ranges sliced via
    cumulative offsets, block maxima via maximum.reduceat. The per-block
    Python loop only slices bytes — measured ~5× faster than per-block
    numpy calls on Zipf-head posting lists (and less python time means
    the groupBy-encode stage scales with cores instead of flatlining).
    """
    cols = encode_blocks_columns(doc_ids, tfs, dls, tf_norms, block_size)
    if cols is None:
        return []
    return list(
        zip(
            cols["block_id"].tolist(),
            cols["n"].tolist(),
            cols["first_doc_id"].tolist(),
            cols["last_doc_id"].tolist(),
            cols["doc_ids"],
            cols["tfs"],
            cols["dls"],
            cols["max_tfnorm"].tolist(),
        )
    )


def encode_blocks_columns(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    tf_norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
):
    """encode_blocks, column-oriented: returns a dict of numpy arrays
    (+ lists of bytes for the payload columns) instead of a list of
    python row tuples, or None for empty input. Byte-identical payloads;
    exists because building the output pandas frame from columns is ~5×
    cheaper than from row tuples (55% of the old encode kernel's time
    was pd.DataFrame(list-of-tuples) — BENCH.md §5)."""
    n = len(doc_ids)
    if n == 0:
        return None
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    tfn = np.ascontiguousarray(tf_norms, dtype=np.float64)

    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)

    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[starts] = ids[starts]  # per-block restart: first value absolute

    buf_ids, off_ids = _varint_encode_with_offsets(deltas)
    buf_tfs, off_tfs = _varint_encode_with_offsets(tfs)
    buf_dls, off_dls = _varint_encode_with_offsets(dls)
    maxes = np.maximum.reduceat(tfn, starts)

    return {
        "block_id": np.arange(len(starts), dtype=np.int64),
        "n": (ends - starts).astype(np.int32),
        "first_doc_id": ids[starts].astype(np.int64),
        "last_doc_id": ids[ends - 1].astype(np.int64),
        "doc_ids": [buf_ids[off_ids[s] : off_ids[e]] for s, e in zip(starts, ends)],
        "tfs": [buf_tfs[off_tfs[s] : off_tfs[e]] for s, e in zip(starts, ends)],
        "dls": [buf_dls[off_dls[s] : off_dls[e]] for s, e in zip(starts, ends)],
        "max_tfnorm": maxes,
    }


def encode_positions_blocks(
    flat_positions: np.ndarray,
    tfs: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> List[bytes]:
    """Per-block position payloads for a docID-sorted posting run.

    flat_positions: all postings' ascending in-doc token offsets
    concatenated in posting order (len == tfs.sum()); tfs gives the
    per-posting counts. Within each posting the offsets are delta-encoded
    (first absolute) — in-doc offsets are ascending so deltas are small —
    and the whole stream is varint-encoded in ONE vectorized pass, then
    sliced at posting-block boundaries (the Lucene .pos file analog:
    positions live beside the postings but are only read by phrase
    queries, never by scoring).
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    n = len(tfs)
    if n == 0:
        return []
    pos = np.ascontiguousarray(flat_positions, dtype=np.uint64)
    total = int(tfs.sum())
    assert pos.size == total, f"positions/tfs mismatch: {pos.size} != {total}"
    # delta within each posting: restart (absolute) at each posting start
    pstarts = np.zeros(n, dtype=np.int64)
    np.cumsum(tfs[:-1], out=pstarts[1:])
    deltas = np.empty_like(pos)
    if total:
        deltas[0] = pos[0]
        np.subtract(pos[1:], pos[:-1], out=deltas[1:])
        deltas[pstarts[tfs > 0]] = pos[pstarts[tfs > 0]]
    buf, off = _varint_encode_with_offsets(deltas)
    # block b covers postings [b*block_size, min((b+1)*bs, n)) → position
    # indices [pstarts[s], pstarts[e-1]+tfs[e-1])
    out = []
    bstarts = np.arange(0, n, block_size, dtype=np.int64)
    bends = np.minimum(bstarts + block_size, n)
    pos_end = pstarts + tfs
    for s, e in zip(bstarts, bends):
        out.append(buf[off[pstarts[s]] : off[pos_end[e - 1]]])
    return out


def decode_positions_rows(enc_pos_list, tfs: np.ndarray) -> np.ndarray:
    """Decode concatenated per-block position payloads back to the flat
    ascending-offset array (len == tfs.sum()), vectorized: one varint
    pass + a grouped cumsum with per-posting restarts."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = varint_decode(b"".join(enc_pos_list), total)
    g = np.cumsum(deltas, dtype=np.uint64)
    n = len(tfs)
    pstarts = np.zeros(n, dtype=np.int64)
    np.cumsum(tfs[:-1], out=pstarts[1:])
    nz = tfs > 0
    prev = np.zeros(n, dtype=np.uint64)
    nzs = pstarts[nz]
    prev_idx = nzs - 1
    valid = prev_idx >= 0
    pr = np.zeros(nzs.size, dtype=np.uint64)
    pr[valid] = g[prev_idx[valid]]
    prev[nz] = pr
    posting_of = np.repeat(np.arange(n, dtype=np.int64), tfs)
    return (g - prev[posting_of]).astype(np.int64)


def decode_block(doc_ids_enc: bytes, tfs_enc: bytes, dls_enc: bytes, n: int):
    """One block row → (doc_ids, tfs, dls) numpy arrays."""
    ids = delta_decode(varint_decode(doc_ids_enc, n))
    tfs = varint_decode(tfs_enc, n)
    dls = varint_decode(dls_enc, n)
    return ids, tfs, dls


def decode_block_rows(
    enc_ids_list, enc_tfs_list, enc_dls_list, ns
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of MANY block rows at once.

    Concatenates the three varint streams across all rows, decodes each
    with ONE varint_decode pass, and un-deltas docIDs per block via a
    global cumsum with per-block offset subtraction (valid because each
    block's first delta is its absolute first docID). Returns
    (block_of: row index per value, doc_ids, tfs, dls) — the caller maps
    block_of back to per-row metadata (term, …). Replaces a per-row
    python loop of 3 numpy calls each (the decode analog of the
    vectorized encode_blocks).
    """
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.uint64)
        return np.zeros(0, dtype=np.int64), z, z, z
    deltas = varint_decode(b"".join(enc_ids_list), total)
    tfs = varint_decode(b"".join(enc_tfs_list), total)
    dls = varint_decode(b"".join(enc_dls_list), total)
    g = np.cumsum(deltas, dtype=np.uint64)
    starts = np.zeros(len(ns), dtype=np.int64)
    np.cumsum(ns[:-1], out=starts[1:])
    prev = np.zeros(len(ns), dtype=np.uint64)
    nz = starts > 0
    prev[nz] = g[starts[nz] - 1]
    block_of = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
    ids = g - prev[block_of]
    return block_of, ids, tfs, dls
