"""Delta + varbyte posting-run codec (pure numpy, Arrow-batch friendly).

The reference leans on Lucene's internal postings compression (delta + vint —
implied by Elasticsearch; SURVEY.md §4.15). Spark has no posting-list codec,
so this module supplies it: sorted (docID, tf, doclen) runs are encoded into
self-contained binary blocks. docIDs are delta-encoded then varbyte-packed;
tf and doclen are varbyte-packed directly. All encode/decode paths are
vectorized numpy (np.add.reduceat for decode) — no per-value Python loops.

Block layout (one blob): varbyte stream of 3*n values —
    [d_0, d_1, ..., d_{n-1}, tf_0..tf_{n-1}, dl_0..dl_{n-1}]
where d_0 is the absolute first docID and d_i (i>0) are deltas (>0: docIDs are
strictly increasing within a run). ``n`` travels in the postings table's
metadata columns, not in the blob.
"""

from __future__ import annotations

import numpy as np

# max varbyte length of a uint64
_MAX_VB = 10
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, _MAX_VB)]


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128-style encode of non-negative int64/uint64 values."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_VB):
        mask = nbytes > j
        if not mask.any():
            break
        byte = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview) -> np.ndarray:
    """Vectorized decode; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    end_pos = np.flatnonzero(is_end)
    starts = np.empty_like(end_pos)
    starts[0] = 0
    starts[1:] = end_pos[:-1] + 1
    lengths = end_pos - starts + 1
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos_in_val).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def encode_run(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one sorted posting run into a single blob."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    n = docids.size
    if n == 0:
        return b""
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(docids[0])
    if n > 1:
        deltas[1:] = np.diff(docids).astype(np.uint64)
    stream = np.concatenate(
        [deltas, np.ascontiguousarray(tfs, dtype=np.uint64), np.ascontiguousarray(dls, dtype=np.uint64)]
    )
    return varbyte_encode(stream)


def decode_run(buf: bytes | memoryview, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a blob back to (docids int64, tfs int32, dls int32)."""
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
        )
    vals = varbyte_decode(buf)
    assert vals.size == 3 * n, f"blob has {vals.size} values, expected {3 * n}"
    docids = np.cumsum(vals[:n].astype(np.int64))
    tfs = vals[n : 2 * n].astype(np.int32)
    dls = vals[2 * n :].astype(np.int32)
    return docids, tfs, dls


def split_blocks(n: int, block_size: int) -> list[tuple[int, int]]:
    """(start, end) slices chopping a run of n postings into blocks."""
    return [(i, min(i + block_size, n)) for i in range(0, n, block_size)]
