"""Snapshot / restore lifecycle — the ES ``_snapshot`` repository analogue
(reference durability story: the es-data volume of docker-compose.yml;
incremental at the immutable-segment-file level, here immutable parquet).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elastichash_spark import build
from elastichash_spark.build import IndexConfig
from elastichash_spark.append import append_index
from elastichash_spark.query import search
from elastichash_spark.snapshot import (
    delete_snapshot,
    list_snapshots,
    restore_index,
    snapshot_index,
    verify_snapshot,
)


@pytest.fixture(scope="module")
def snap_idx(spark, t1, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snapidx") / "t1")
    build.build_index(spark, t1, d, IndexConfig(num_shards=4, salt_buckets=2))
    return d


def _topk(spark, idx, queries):
    rows = search(spark, idx, queries).collect()
    return [(r["qid"], r["rank"], r["docID"], round(r["score"], 9)) for r in rows]


def test_snapshot_restore_rank_identity(spark, t1_queries_pandas, snap_idx, tmp_path):
    repo = str(tmp_path / "repo")
    dest = str(tmp_path / "restored")
    qs = [(int(r.qid), r.text, 10) for r in t1_queries_pandas.head(8).itertuples()]

    before = _topk(spark, snap_idx, qs)
    res = snapshot_index(snap_idx, repo, "snap1")
    # reused>0 even on a fresh repo is legal: identical-content files
    # (e.g. empty _SUCCESS markers) share one blob
    assert res["blobs_copied"] > 0 and res["blobs_copied"] > res["blobs_reused"]
    assert verify_snapshot(repo, "snap1") == []

    restore_index(repo, "snap1", dest)
    assert _topk(spark, dest, qs) == before
    # the restored dir is a full index: stats/metadata travel with it
    assert build.load_index(spark, dest)[0]["avgdl"] == \
        build.load_index(spark, snap_idx)[0]["avgdl"]


def test_snapshot_incremental_after_append(spark, t1, snap_idx, tmp_path):
    """Second snapshot after an append copies only the NEW files — published
    index files are immutable, so unchanged blobs are reused (ES's
    segment-level incrementality)."""
    repo = str(tmp_path / "repo")
    first = snapshot_index(snap_idx, repo, "s1")
    extra = t1.withColumn("conv_id", F.concat(F.lit("snapx_"), F.col("conv_id"))).limit(200)
    append_index(spark, extra, snap_idx, run_id="snapappend")
    second = snapshot_index(snap_idx, repo, "s2")
    # the base build's files are immutable across the append, so s2 reuses
    # (up to intra-snapshot duplicate content) everything s1 copied
    assert second["blobs_reused"] >= first["blobs_copied"] - 2
    names = [s["name"] for s in list_snapshots(repo)]
    assert names == ["s1", "s2"]
    # both snapshots remain independently restorable and verified
    assert verify_snapshot(repo, "s1") == []
    assert verify_snapshot(repo, "s2") == []


def test_snapshot_corruption_detected(spark, snap_idx, tmp_path):
    repo = str(tmp_path / "repo")
    snap = snapshot_index(snap_idx, repo, "c1")
    assert snap["files"] > 2
    blob_dir = os.path.join(repo, "blobs")
    victim = sorted(
        (os.path.getsize(os.path.join(blob_dir, b)), b) for b in os.listdir(blob_dir)
    )[-1][1]  # corrupt the largest blob (a postings file, not the manifest)
    with open(os.path.join(blob_dir, victim), "r+b") as f:
        f.seek(0)
        f.write(b"\x00\xff\x00\xff")
    problems = verify_snapshot(repo, "c1")
    assert len(problems) == 1 and "does not hash" in problems[0]
    with pytest.raises(ValueError, match="corruption"):
        restore_index(repo, "c1", str(tmp_path / "dest"))
    # the failed restore must not have produced a loadable index
    assert not os.path.exists(os.path.join(tmp_path / "dest", "_MANIFEST.json"))


def test_delete_snapshot_gc(spark, t1, snap_idx, tmp_path):
    """ES DELETE _snapshot semantics: deleting one snapshot GCs exactly the
    blobs no remaining snapshot references; shared blobs survive and the
    surviving snapshot stays verified and restorable."""
    repo = str(tmp_path / "repo")
    blob_dir = os.path.join(repo, "blobs")
    snapshot_index(snap_idx, repo, "d1")
    extra = t1.withColumn("conv_id", F.concat(F.lit("snapy_"), F.col("conv_id"))).limit(150)
    append_index(spark, extra, snap_idx, run_id="snapdel")
    snapshot_index(snap_idx, repo, "d2")
    n_before = len(os.listdir(blob_dir))

    res = delete_snapshot(repo, "d2")
    # d2-only blobs (the appended shard files + new manifest) are swept;
    # everything d1 references survives
    assert res["blobs_deleted"] > 0 and res["foreign"] == []
    assert res["blobs_kept"] == n_before - res["blobs_deleted"]
    assert [s["name"] for s in list_snapshots(repo)] == ["d1"]
    assert verify_snapshot(repo, "d1") == []
    restore_index(repo, "d1", str(tmp_path / "dest_d1"))

    # deleting the LAST snapshot empties the blob store (full GC)
    res2 = delete_snapshot(repo, "d1")
    assert res2["blobs_kept"] == 0
    assert os.listdir(blob_dir) == []
    with pytest.raises(ValueError, match="no snapshot"):
        delete_snapshot(repo, "d1")


def test_restore_rejects_traversal_inventory(spark, snap_idx, tmp_path):
    """A corrupt/hand-edited inventory whose relpath escapes the restore
    target is refused before any write lands outside dest."""
    import json

    repo = str(tmp_path / "repo")
    snapshot_index(snap_idx, repo, "t1")
    snap_path = os.path.join(repo, "snapshots", "t1.json")
    with open(snap_path) as f:
        snap = json.load(f)
    victim_rel, victim_meta = next(
        (r, m) for r, m in snap["files"].items() if r != "_MANIFEST.json")
    snap["files"]["../escape.bin"] = victim_meta
    del snap["files"][victim_rel]
    with open(snap_path, "w") as f:
        json.dump(snap, f)
    dest = str(tmp_path / "dest")
    with pytest.raises(ValueError, match="escapes the restore target"):
        restore_index(repo, "t1", dest)
    assert not os.path.exists(str(tmp_path / "escape.bin"))


def test_snapshot_guards(spark, snap_idx, tmp_path):
    repo = str(tmp_path / "repo")
    snapshot_index(snap_idx, repo, "g1")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(snap_idx, repo, "g1")
    with pytest.raises(ValueError, match="no snapshot"):
        restore_index(repo, "nope", str(tmp_path / "d2"))
    with pytest.raises(ValueError, match="no _MANIFEST"):
        snapshot_index(str(tmp_path / "not_an_index"), repo, "g2")


def test_snapshot_cli_job(spark, t1_queries_pandas, snap_idx, tmp_path):
    """The ship surface for the repository: ``jobs/snapshot_index.py`` is a
    --py-files job like build/append/compact/query, but pure driver-side file
    plumbing — it must run identically under plain ``python`` (no JVM spin-up),
    which is how this test exercises snapshot→list→verify→restore→delete."""
    import json
    import subprocess
    import sys

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    job = os.path.join(repo_dir, "elastichash_spark", "jobs", "snapshot_index.py")
    env = {**os.environ, "PYTHONPATH": repo_dir}

    def run(*args):
        out = subprocess.run([sys.executable, job, *args], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    repo = str(tmp_path / "repo")
    dest = str(tmp_path / "restored")

    snap = run("snapshot", "--index", snap_idx, "--repo", repo, "--name", "cli1")
    assert snap["job"] == "snapshot_snapshot" and snap["blobs_copied"] > 0

    listed = run("list", "--repo", repo)
    assert [s["name"] for s in listed["snapshots"]] == ["cli1"]

    verified = run("verify", "--repo", repo, "--name", "cli1")
    assert verified["ok"] is True and verified["problems"] == []

    restored = run("restore", "--repo", repo, "--name", "cli1", "--dest", dest)
    assert restored["files"] == snap["files"]
    qs = [(int(r.qid), r.text, 10) for r in t1_queries_pandas.head(4).itertuples()]
    assert _topk(spark, dest, qs) == _topk(spark, snap_idx, qs)

    deleted = run("delete", "--repo", repo, "--name", "cli1")
    assert deleted["blobs_deleted"] > 0 and deleted["foreign"] == []
    assert run("list", "--repo", repo)["snapshots"] == []
