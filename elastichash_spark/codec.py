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

# Bump on ANY change to the blob layout or encode semantics: the suite's
# cached-index tag (build.index_format_tag) hashes this, so a bump invalidates
# every cached index automatically instead of silently resuming a stale one.
FORMAT_VERSION = 1

# max varbyte length of a uint64
_MAX_VB = 10
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, _MAX_VB)]


def _varbyte_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128-style encode; returns (byte array, per-value byte
    lengths) so callers can slice multi-run streams without re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    vmax = int(v.max())
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        if vmax < int(t):  # all remaining thresholds exceed every value
            break
        nbytes += v >= t
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        if j == 0:
            idx = starts
            nb = nbytes
            vv = v
        else:
            mask = nbytes > j
            idx = starts[mask] + j
            nb = nbytes[mask]
            vv = v[mask]
        byte = (vv >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb - 1 > j).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128-style encode of non-negative int64/uint64 values."""
    out, _ = _varbyte_encode_arr(values)
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


# ------------------------------------------------- group-vectorized paths
#
# The build kernels encode/decode MILLIONS of tiny runs per partition (the
# Zipf tail means the average group holds <10 postings). Calling
# encode_run/decode_run per group costs ~20 numpy dispatches per handful of
# values — per-group Python overhead dominates the build. These variants do
# the same work for ALL groups of a partition in one vectorized pass and are
# byte-identical per group to the scalar paths (tests assert it).


def encode_runs_grouped(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode every [starts[g], ends[g]) slice as its own run, in one pass.

    The slices must tile the arrays contiguously in order (ends[g] ==
    starts[g+1], starts[0] == 0, ends[-1] == len). Returns
    (data uint8 array, byte_offsets int64 of size G+1): run g's blob is
    ``data[byte_offsets[g]:byte_offsets[g+1]]``, byte-identical to
    ``encode_run(docids[s:e], tfs[s:e], dls[s:e])``.
    """
    n_total = docids.size
    g_count = starts.size
    if n_total == 0 or g_count == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(g_count + 1, dtype=np.int64)
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    sizes = (ends - starts).astype(np.int64)
    # per-run delta encoding with a reset (absolute docID) at each run start
    deltas = np.empty(n_total, dtype=np.int64)
    deltas[1:] = np.diff(docids)
    deltas[starts] = docids[starts]
    # interleave [deltas_g, tfs_g, dls_g] per run into one value stream:
    # run g occupies stream[3*starts[g] : 3*ends[g])
    srep = np.repeat(starts, sizes)
    szrep = np.repeat(sizes, sizes)
    within = np.arange(n_total, dtype=np.int64) - srep
    base = 3 * srep + within
    stream = np.empty(3 * n_total, dtype=np.uint64)
    stream[base] = deltas.astype(np.uint64)
    stream[base + szrep] = np.ascontiguousarray(tfs, dtype=np.uint64)
    stream[base + 2 * szrep] = np.ascontiguousarray(dls, dtype=np.uint64)
    data, nbytes = _varbyte_encode_arr(stream)
    bofs = np.zeros(3 * n_total + 1, dtype=np.int64)
    np.cumsum(nbytes, out=bofs[1:])
    offsets = np.empty(g_count + 1, dtype=np.int64)
    offsets[:-1] = bofs[3 * starts]
    offsets[-1] = bofs[-1]
    return data, offsets


def decode_runs_concat(
    blobs, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode many runs in one pass (varbyte values are self-terminating, so
    concatenated blobs decode as one stream). ``blobs`` is either a list of
    per-run blobs or one already-concatenated buffer (bytes/memoryview/uint8
    array — e.g. an Arrow binary column's data buffer, zero-copy). Returns
    flat (docids, tfs, dls, run_starts) where run r's postings occupy
    [run_starts[r], run_starts[r+1]).
    """
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    n_total = int(ns.sum())
    run_starts = np.zeros(ns.size + 1, dtype=np.int64)
    np.cumsum(ns, out=run_starts[1:])
    if n_total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.astype(np.int32), e.astype(np.int32), run_starts
    vals = varbyte_decode(b"".join(blobs) if isinstance(blobs, list) else blobs)
    assert vals.size == 3 * n_total, f"{vals.size} values != 3*{n_total}"
    # value stream layout per run: [deltas, tfs, dls]; gather back to flat
    starts = run_starts[:-1]
    srep = np.repeat(starts, ns)
    szrep = np.repeat(ns, ns)
    within = np.arange(n_total, dtype=np.int64) - srep
    base = 3 * srep + within
    deltas = vals[base].astype(np.int64)
    tfs = vals[base + szrep].astype(np.int32)
    dls = vals[base + 2 * szrep].astype(np.int32)
    # cumsum with reset at run starts: subtract the carry-in before each run
    c = np.cumsum(deltas)
    carry = c[starts] - deltas[starts]
    docids = c - np.repeat(carry, ns)
    return docids, tfs, dls, run_starts


def block_bounds(
    starts: np.ndarray, ends: np.ndarray, block_size
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chop each [starts[g], ends[g]) group into blocks of ``block_size``
    (a scalar, or a per-group array for adaptive sizing), vectorized.
    Returns (bstarts, bends, block_ids, group_index) over all groups' blocks
    in order."""
    sizes = (ends - starts).astype(np.int64)
    bsz = np.broadcast_to(
        np.asarray(block_size, dtype=np.int64), sizes.shape
    )
    nblocks = (sizes + bsz - 1) // bsz
    total = int(nblocks.sum())
    gidx = np.repeat(np.arange(starts.size, dtype=np.int64), nblocks)
    bofs = np.zeros(starts.size + 1, dtype=np.int64)
    np.cumsum(nblocks, out=bofs[1:])
    block_ids = np.arange(total, dtype=np.int64) - np.repeat(bofs[:-1], nblocks)
    bstarts = starts[gidx] + bsz[gidx] * block_ids
    bends = np.minimum(bstarts + bsz[gidx], ends[gidx])
    return bstarts, bends, block_ids, gidx


def adaptive_block_sizes(
    sizes: np.ndarray, block_size: int, min_blocks: int = 16, min_size: int = 4
) -> np.ndarray:
    """Per-group block size: ``block_size`` for long posting lists, smaller
    for short ones so every list gets ~``min_blocks`` blocks (floor
    ``min_size``). Rationale: a rare term squeezed into one block spans the
    whole docID space, so its block max poisons every other term's pruning
    bound (query.py stage 1); chopping short lists finer gives block-aligned
    bounds real resolution at negligible metadata cost (short lists are short).
    """
    sizes = np.asarray(sizes, dtype=np.int64)
    target = np.maximum(min_size, -(-sizes // min_blocks))  # ceil div
    return np.minimum(block_size, target)
