"""Index snapshot / restore — the ES ``_snapshot`` API analogue.

The reference deploys ElasticHash as a Docker-composed Elasticsearch whose
durability story is ES's own snapshot repository (the es-data volume in
/root/reference/docker-compose.yml:21-27; ES snapshots are incremental at
the Lucene-segment-file level because segment files are immutable). This
engine's published index files have the same immutability property — a
finished build never rewrites a docs/terms/postings parquet file in place
(appends add NEW shard files, compaction/expunge/reindex publish into NEW
directories and atomically swap) — so snapshots here are incremental the
same way: a content-addressed blob repository in which a file already
present from an earlier snapshot is reused, not re-copied.

Repository layout (all local-fs here; at 100 TB the same layout maps 1:1
onto an object store, where ``blobs/`` keys become object keys and the
"copy" is a server-side PUT-copy — the inventory JSON stays tiny because
it holds only (relpath, size, sha256) triples, never data):

    repo/
      blobs/<sha256>            one immutable content-addressed payload each
      snapshots/<name>.json     inventory: files -> (size, sha256) + metadata

Only the QUERYABLE state is captured: the root ``_MANIFEST.json`` plus the
``docs`` / ``terms`` / ``postings`` / ``deletes`` stages. Build
intermediates (``mruns``, ``runs``) are deliberately excluded — they exist
to resume an UNFINISHED build; a snapshot of a finished index never needs
them (ES likewise snapshots segments, not indexing buffers).

``verify_snapshot`` is the Lucene ``CheckIndex`` analogue for the
repository: every blob referenced by the inventory must exist and hash to
its recorded sha256. ``restore_index`` verifies each blob's hash as it
copies, so a bit-rotted repository can never restore silently.

Scale notes: hashing is streamed in 1 MiB chunks (no file is read into
memory whole); per-file work is independent, so a cluster-sized snapshot
would fan the inventory out with ``spark.sparkContext.parallelize`` — at
sandbox scale the file count is tiny and a driver loop is both simpler and
faster than a job per few-MB directory.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from .manifest import MANIFEST_NAME

SNAP_STAGES = ("docs", "terms", "postings", "deletes")
_CHUNK = 1 << 20


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(_CHUNK)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _inventory(index_dir: str) -> dict[str, dict]:
    """relpath -> {size, sha256} for the queryable files of a finished index."""
    files: dict[str, dict] = {}
    root_manifest = os.path.join(index_dir, MANIFEST_NAME)
    if os.path.exists(root_manifest):
        files[MANIFEST_NAME] = {"size": os.path.getsize(root_manifest),
                                "sha256": _sha256(root_manifest)}
    for stage in SNAP_STAGES:
        sdir = os.path.join(index_dir, stage)
        if not os.path.isdir(sdir):
            continue
        for dirpath, _dirs, names in os.walk(sdir):
            for n in sorted(names):
                if n.endswith(".tmp"):
                    continue  # unpublished partial — never part of a snapshot
                p = os.path.join(dirpath, n)
                rel = os.path.relpath(p, index_dir)
                files[rel] = {"size": os.path.getsize(p), "sha256": _sha256(p)}
    return files


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot a finished index into a content-addressed repository.

    Incremental: a blob whose sha256 already exists in the repo (from any
    earlier snapshot of any index) is counted as ``reused`` and not copied.
    The inventory publishes atomically LAST (tmp + rename), so a crash
    mid-snapshot leaves at worst orphan blobs, never a readable-but-partial
    snapshot — the same publish discipline as the build manifests.
    """
    inv = _inventory(index_dir)
    if MANIFEST_NAME not in inv:
        raise ValueError(f"{index_dir} has no {MANIFEST_NAME}; snapshot requires "
                         "a finished build (unfinished builds resume, not snapshot)")
    blob_dir = os.path.join(repo_dir, "blobs")
    snap_dir = os.path.join(repo_dir, "snapshots")
    os.makedirs(blob_dir, exist_ok=True)
    os.makedirs(snap_dir, exist_ok=True)
    snap_path = os.path.join(snap_dir, f"{name}.json")
    if os.path.exists(snap_path):
        raise ValueError(f"snapshot {name!r} already exists in {repo_dir}")
    copied = reused = nbytes = 0
    for rel, meta in inv.items():
        blob = os.path.join(blob_dir, meta["sha256"])
        nbytes += meta["size"]
        if os.path.exists(blob):
            reused += 1
            continue
        tmp = blob + ".tmp"
        shutil.copyfile(os.path.join(index_dir, rel), tmp)
        os.replace(tmp, blob)
        copied += 1
    payload = {"name": name, "index_dir": os.path.abspath(index_dir),
               "created_at_unix": time.time(), "files": inv,
               "n_files": len(inv), "bytes": nbytes}
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, snap_path)
    return {"name": name, "files": len(inv), "bytes": nbytes,
            "blobs_copied": copied, "blobs_reused": reused}


def _load_snapshot(repo_dir: str, name: str) -> dict:
    p = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if not os.path.exists(p):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    with open(p) as f:
        return json.load(f)


def verify_snapshot(repo_dir: str, name: str) -> list[str]:
    """CheckIndex for the repository: [] iff every referenced blob exists
    and hashes to its recorded sha256."""
    snap = _load_snapshot(repo_dir, name)
    problems = []
    for rel, meta in sorted(snap["files"].items()):
        blob = os.path.join(repo_dir, "blobs", meta["sha256"])
        if not os.path.exists(blob):
            problems.append(f"{rel}: missing blob {meta['sha256'][:12]}")
        elif os.path.getsize(blob) != meta["size"]:
            problems.append(f"{rel}: size {os.path.getsize(blob)} != {meta['size']}")
        elif _sha256(blob) != meta["sha256"]:
            problems.append(f"{rel}: blob content does not hash to its name")
    return problems


def restore_index(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Materialize a snapshot as a ready-to-query index directory.

    Every blob is re-hashed while restoring; any mismatch aborts before the
    index manifest is placed, so a partially-restored directory is never
    mistaken for a finished index (load_index requires the root manifest,
    which this function writes LAST).
    """
    snap = _load_snapshot(repo_dir, name)
    if os.path.exists(dest_dir) and os.listdir(dest_dir):
        raise ValueError(f"restore target {dest_dir} is not empty")
    os.makedirs(dest_dir, exist_ok=True)
    manifest_rel = None
    for rel, meta in sorted(snap["files"].items()):
        if rel == MANIFEST_NAME:
            manifest_rel = rel
            continue
        _restore_one(repo_dir, dest_dir, rel, meta)
    if manifest_rel is None:
        raise ValueError(f"snapshot {name!r} carries no {MANIFEST_NAME}")
    _restore_one(repo_dir, dest_dir, manifest_rel, snap["files"][manifest_rel])
    return {"name": name, "files": snap["n_files"], "bytes": snap["bytes"],
            "dest": dest_dir}


def _restore_one(repo_dir: str, dest_dir: str, rel: str, meta: dict) -> None:
    blob = os.path.join(repo_dir, "blobs", meta["sha256"])
    if _sha256(blob) != meta["sha256"]:
        raise ValueError(f"repository corruption: blob for {rel} fails its hash")
    dest_abs = os.path.abspath(dest_dir)
    out = os.path.abspath(os.path.join(dest_abs, rel))
    # inventory relpaths come from a JSON file on disk — refuse any that
    # would escape the restore target (corrupt or hand-edited inventory)
    if os.path.commonpath([out, dest_abs]) != dest_abs:
        raise ValueError(f"repository corruption: inventory path {rel!r} "
                         "escapes the restore target")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    shutil.copyfile(blob, out)


def delete_snapshot(repo_dir: str, name: str) -> dict:
    """ES ``DELETE _snapshot/<repo>/<name>`` analogue: remove the snapshot's
    inventory, then garbage-collect every blob no remaining snapshot
    references (ES deletes segment blobs the same way — a blob lives while
    ANY snapshot's inventory names it).

    The inventory unlink is the commit point; a crash between it and the
    GC sweep leaves only orphan blobs, which the next delete's sweep
    collects — the mirror image of ``snapshot_index``'s crash story (orphan
    blobs, never a partial inventory). Single-writer like the rest of the
    repository: concurrent snapshot/delete on one repo_dir is out of
    contract (at 100 TB the object store's conditional-put takes over).
    Only hex-named blob files and abandoned ``.tmp`` payloads are swept —
    a foreign file in ``blobs/`` is reported, not deleted.
    """
    snap = _load_snapshot(repo_dir, name)  # loud if absent
    os.remove(os.path.join(repo_dir, "snapshots", f"{name}.json"))
    live: set[str] = set()
    for other in list_snapshots(repo_dir):
        inv = _load_snapshot(repo_dir, other["name"])
        live.update(m["sha256"] for m in inv["files"].values())
    blob_dir = os.path.join(repo_dir, "blobs")
    deleted = kept = 0
    foreign: list[str] = []
    for b in sorted(os.listdir(blob_dir)) if os.path.isdir(blob_dir) else []:
        if b in live:
            kept += 1
        elif b.endswith(".tmp") or _is_hex_sha256(b):
            os.remove(os.path.join(blob_dir, b))
            deleted += 1
        else:
            foreign.append(b)
    return {"name": name, "freed_files": len(snap["files"]),
            "blobs_deleted": deleted, "blobs_kept": kept, "foreign": foreign}


def _is_hex_sha256(name: str) -> bool:
    return len(name) == 64 and all(c in "0123456789abcdef" for c in name)


def list_snapshots(repo_dir: str) -> list[dict]:
    """(name, n_files, bytes, created_at_unix) rows, newest last."""
    snap_dir = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(snap_dir):
        return []
    out = []
    for n in sorted(os.listdir(snap_dir)):
        if not n.endswith(".json"):
            continue
        with open(os.path.join(snap_dir, n)) as f:
            s = json.load(f)
        out.append({"name": s["name"], "n_files": s["n_files"],
                    "bytes": s["bytes"], "created_at_unix": s["created_at_unix"]})
    return out
