"""Pinned (snapshot-isolated) read views — pin.py.

The contract under test is the one append.py used to delegate to the table
format: a reader holding a pinned view sees ONE committed index state, never
a torn one, regardless of appends/deletes racing it on the source. Evidence
order: equality at rest, isolation from a subsequent append and delete,
deterministic retry coverage via the ``_between`` seam, a loud failure on a
crashed-append layout, and a real concurrent append/reader interleave."""

from __future__ import annotations

import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from elastichash_spark import build, query
from elastichash_spark.append import append_index
from elastichash_spark.build import IndexConfig
from elastichash_spark.manifest import read_manifest
from elastichash_spark.pin import pin_index, unpin_index


CFG = IndexConfig(num_shards=4, salt_buckets=2, block_size=16,
                  doc_order="doclen")
QUERIES = [(0, "the w00001", 10), (1, "agent tool w00042", 10),
           (2, "w00007 w00009", 5)]


def _results(spark, index_dir):
    rows = (query.search(spark, index_dir, QUERIES, "wand")
            .orderBy("qid", "rank").collect())
    return [(r["qid"], r["rank"], r["docID"], round(r["score"], 9))
            for r in rows]


@pytest.fixture(scope="module")
def halves(t1):
    a = t1.where(F.col("conv_id") < "conv000025")
    b = t1.where(F.col("conv_id") >= "conv000025")
    return a, b


def test_pin_equality_and_unpin_guard(spark, halves, tmp_path_factory):
    a, _b = halves
    root = tmp_path_factory.mktemp("pin_eq")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    p = str(root / "view")
    info = pin_index(d, p)
    assert info["files_linked"] > 0 and info["appends"] == []
    assert _results(spark, p) == _results(spark, d)
    # the view is a complete index dir: manifest matches the source's
    assert read_manifest(p)["n_docs"] == read_manifest(d)["n_docs"]
    # unpin refuses a directory pin_index did not create
    with pytest.raises(ValueError, match="not a pinned view"):
        unpin_index(d)
    unpin_index(p)
    assert not os.path.exists(p)
    # pinning onto an existing path is refused loudly
    os.makedirs(p)
    with pytest.raises(ValueError, match="already exists"):
        pin_index(d, p)


def test_pin_isolates_append_and_delete(spark, halves, tmp_path_factory):
    a, b = halves
    root = tmp_path_factory.mktemp("pin_iso")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    pre = _results(spark, d)
    n_pre = read_manifest(d)["n_docs"]

    p1 = str(root / "v1")
    pin_index(d, p1)

    # writer moves on: append the second half, then soft-delete some docs
    append_index(spark, b, d, run_id="b1")
    from elastichash_spark.deletes import delete_by_query
    n_del = delete_by_query(spark, d, "turn_idx = 0")
    assert n_del > 0

    # the pinned view still serves the EXACT pre-append, pre-delete state
    assert _results(spark, p1) == pre
    assert read_manifest(p1)["n_docs"] == n_pre
    # while the source serves the post-append, post-delete state
    post = _results(spark, d)
    assert post != pre
    assert read_manifest(d)["appends"] == ["b1"]

    # a fresh pin captures the new committed state, tombstones included —
    # and the PUBLISHED append's lineage backup does not block it
    assert os.path.isdir(os.path.join(d, "terms.pre_b1"))
    p2 = str(root / "v2")
    info2 = pin_index(d, p2)
    assert info2["appends"] == ["b1"]
    assert _results(spark, p2) == post
    unpin_index(p1)
    unpin_index(p2)


def test_pin_retries_when_publish_races_the_link(spark, halves,
                                                 tmp_path_factory):
    """Deterministic retry coverage: an append publishes between the link
    pass and the manifest recheck (the ``_between`` seam). The pin must
    discard the torn attempt and return a view of the POST-append commit."""
    a, b = halves
    root = tmp_path_factory.mktemp("pin_race")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)

    p = str(root / "view")
    pin_index(d, p, _between=lambda: append_index(spark, b, d, run_id="b1"))
    assert read_manifest(p)["appends"] == ["b1"]
    assert _results(spark, p) == _results(spark, d)
    unpin_index(p)


def test_pin_raises_loud_on_crashed_append_layout(spark, halves,
                                                  tmp_path_factory):
    """A crashed append parked mid-swap (terms dir absent, backup present)
    never heals by itself; pin must fail loudly, not hand out a torn view."""
    a, _b = halves
    root = tmp_path_factory.mktemp("pin_crash")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    os.rename(os.path.join(d, "terms"), os.path.join(d, "terms.pre_zz"))
    with pytest.raises(RuntimeError, match="consistent snapshot"):
        pin_index(d, str(root / "view"), max_retries=3)
    assert not os.path.exists(str(root / "view"))
    os.rename(os.path.join(d, "terms.pre_zz"), os.path.join(d, "terms"))
    # healed source pins fine again
    p = str(root / "view2")
    pin_index(d, p)
    unpin_index(p)


def test_pin_refuses_unpublished_swap_markers(spark, halves,
                                              tmp_path_factory):
    """The window the manifest recheck can't see: a writer crashed AFTER
    its visible swap but BEFORE its root-manifest publish. Each marker —
    unpublished terms.pre_*, unpublished postings.pre_*, the _COMPACTING
    sentinel — must make pin refuse loudly; removing it heals the pin."""
    a, _b = halves
    root = tmp_path_factory.mktemp("pin_marks")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    for marker, kind in [("terms.pre_qq", "dir"),
                         ("postings.pre_qq", "dir"),
                         ("_COMPACTING", "file")]:
        path = os.path.join(d, marker)
        if kind == "dir":
            os.makedirs(path)
        else:
            open(path, "w").close()
        with pytest.raises(RuntimeError, match="consistent snapshot"):
            pin_index(d, str(root / "view"), max_retries=2)
        assert not os.path.exists(str(root / "view"))
        (shutil.rmtree if kind == "dir" else os.remove)(path)
    p = str(root / "view_ok")
    pin_index(d, p)
    unpin_index(p)


def test_compact_clears_stale_sentinel(spark, halves, tmp_path_factory):
    """A compaction that crashed after its manifest publish leaves the
    sentinel behind; the rerun short-circuits ('nothing to fold') and must
    clear it so pins stop refusing."""
    from elastichash_spark.append import compact_index
    from elastichash_spark.pin import COMPACTING_SENTINEL

    a, b = halves
    root = tmp_path_factory.mktemp("pin_stale")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    append_index(spark, b, d, run_id="b1")
    out = compact_index(spark, d, run_id="cmp1")
    assert out.get("skipped") is None
    # compact removes its own sentinel on success
    assert not os.path.exists(os.path.join(d, COMPACTING_SENTINEL))
    # simulate the crash-after-publish leftover, then rerun
    open(os.path.join(d, COMPACTING_SENTINEL), "w").close()
    out2 = compact_index(spark, d, run_id="cmp1")
    assert out2.get("skipped") == "no append generations to fold"
    assert not os.path.exists(os.path.join(d, COMPACTING_SENTINEL))
    p = str(root / "view")
    pin_index(d, p)
    unpin_index(p)


def test_pin_concurrent_append_interleave(spark, halves, tmp_path_factory):
    """Real concurrency: a reader loops pin→query→unpin while an append
    runs in another thread. Every view obtained must equal ONE committed
    state — the pre-append results or the post-append results — never a
    mix; which one is identified by the view's own manifest."""
    a, b = halves
    root = tmp_path_factory.mktemp("pin_conc")
    d = str(root / "idx")
    build.build_index(spark, a, d, CFG)
    pre = _results(spark, d)
    n_pre = read_manifest(d)["n_docs"]

    err: list[BaseException] = []

    def writer():
        try:
            append_index(spark, b, d, run_id="c1")
        except BaseException as e:  # surfaced after join
            err.append(e)

    t = threading.Thread(target=writer)
    t.start()
    captured = []
    i = 0
    while t.is_alive() or not captured:
        p = str(root / f"v{i}")
        i += 1
        info = pin_index(d, p)
        captured.append((info["n_docs"], info["appends"], _results(spark, p)))
        unpin_index(p)
        if len(captured) >= 12:
            break
    t.join()
    assert not err, err
    post = _results(spark, d)
    n_post = read_manifest(d)["n_docs"]
    assert n_post > n_pre
    seen_states = set()
    for n_docs, appends, res in captured:
        if n_docs == n_pre:
            assert appends == [] and res == pre
            seen_states.add("pre")
        else:
            assert n_docs == n_post and appends == ["c1"] and res == post
            seen_states.add("post")
    # the loop overlaps the append, so the pre-state is always witnessed
    assert "pre" in seen_states
