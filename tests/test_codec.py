"""Codec round-trips — the analogue of the reference's inline conversion
self-asserts (``/root/reference/experiments/util.py:146-155``), upgraded to
property-based tests (FIXTURES.md §4.4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elastichash_spark.codec import (
    decode_run,
    encode_run,
    split_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    out = varbyte_decode(varbyte_encode(vals))
    assert (out == vals).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=0, max_value=100000),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
def test_run_roundtrip(postings):
    postings.sort()
    docids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int32)
    dls = np.array([p[2] for p in postings], dtype=np.int32)
    blob = encode_run(docids, tfs, dls)
    d2, t2, l2 = decode_run(blob, len(postings))
    assert (d2 == docids).all()
    assert (t2 == tfs).all()
    assert (l2 == dls).all()


def test_single_element_run():
    blob = encode_run(np.array([12345]), np.array([3]), np.array([77]))
    d, t, l = decode_run(blob, 1)
    assert d.tolist() == [12345] and t.tolist() == [3] and l.tolist() == [77]


def test_split_blocks():
    assert split_blocks(0, 128) == []
    assert split_blocks(1, 128) == [(0, 1)]
    assert split_blocks(128, 128) == [(0, 128)]
    assert split_blocks(300, 128) == [(0, 128), (128, 256), (256, 300)]


def test_compression_beats_raw():
    """Delta+varbyte on dense ascending docIDs must beat 8-byte raw docIDs."""
    n = 10000
    docids = np.cumsum(np.random.default_rng(0).integers(1, 20, n))
    tfs = np.ones(n, dtype=np.int32)
    dls = np.full(n, 60, dtype=np.int32)
    blob = encode_run(docids.astype(np.int64), tfs, dls)
    assert len(blob) < n * 8  # raw docids alone would be 8n bytes


def test_grouped_encode_matches_scalar():
    from elastichash_spark import codec
    """encode_runs_grouped is byte-identical per group to encode_run, and
    decode_runs_concat round-trips (the kernels' group-vectorized paths)."""
    rng = np.random.Generator(np.random.PCG64(17))
    for _ in range(20):
        g_count = int(rng.integers(1, 50))
        sizes = rng.integers(1, 40, size=g_count)
        n = int(sizes.sum())
        ends = np.cumsum(sizes)
        starts = np.concatenate([[0], ends[:-1]])
        doc = rng.choice(10**7, size=n, replace=False)
        for s, e in zip(starts, ends):
            doc[s:e] = np.sort(doc[s:e])
        tf = rng.integers(1, 300, size=n)
        dl = rng.integers(1, 4000, size=n)
        data, offs = codec.encode_runs_grouped(doc, tf, dl, starts, ends)
        for g, (s, e) in enumerate(zip(starts, ends)):
            assert bytes(data[offs[g]:offs[g + 1]]) == codec.encode_run(
                doc[s:e], tf[s:e], dl[s:e]
            )
        blobs = [bytes(data[offs[g]:offs[g + 1]]) for g in range(g_count)]
        d2, t2, l2, rs = codec.decode_runs_concat(blobs, sizes)
        assert (d2 == doc).all() and (t2 == tf).all() and (l2 == dl).all()
        assert (rs[:-1] == starts).all() and rs[-1] == n


def test_block_bounds():
    from elastichash_spark import codec
    bs, be, bids, gidx = codec.block_bounds(
        np.array([0, 5]), np.array([5, 300]), 128
    )
    assert list(zip(bs, be)) == [(0, 5), (5, 133), (133, 261), (261, 300)]
    assert list(bids) == [0, 0, 1, 2]
    assert list(gidx) == [0, 1, 1, 1]


def test_blob_concat_zero_copy_and_sliced_batches():
    """_blob_concat must equal the byte-concatenation of a batch's blob
    values — including on a SLICED RecordBatch, where the binary array's
    offset is nonzero and naive buffer reads would grab the wrong window."""
    import pyarrow as pa

    from elastichash_spark import codec
    from elastichash_spark.append import _blob_concat

    rng = np.random.default_rng(7)
    blobs, ns = [], []
    for _ in range(20):
        n = int(rng.integers(1, 12))
        doc = np.cumsum(rng.integers(1, 50, size=n)).astype(np.int64)
        blobs.append(codec.encode_run(
            doc, rng.integers(1, 9, size=n), rng.integers(1, 400, size=n)))
        ns.append(n)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(range(20)), type=pa.int64()),
         pa.array(ns, type=pa.int64()), pa.array(blobs, type=pa.binary())],
        names=["termID", "n", "blob"],
    )
    assert bytes(_blob_concat(batch)) == b"".join(blobs)
    for s, ln in [(0, 20), (3, 9), (19, 1), (5, 0)]:
        sl = batch.slice(s, ln)
        assert bytes(_blob_concat(sl)) == b"".join(blobs[s:s + ln])
        if ln:
            d, t, l, rs = codec.decode_runs_concat(
                _blob_concat(sl), np.asarray(ns[s:s + ln], dtype=np.int64))
            assert rs[-1] == sum(ns[s:s + ln])
