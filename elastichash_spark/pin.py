"""Pinned (snapshot-isolated) read views over the raw index layout.

The engine's published files are effectively immutable — a finished build
never rewrites a parquet file in place. Appends ADD docs/postings partitions
and publish by renaming whole directories (``append.py``: the old term
dictionary survives as ``terms.pre_<run_id>``; compaction keeps
``postings.pre_<run_id>``); the root ``_MANIFEST.json`` publishes LAST via
tmp+rename. That gives the raw layout the two properties Iceberg's snapshot
reads are built on:

1. **the manifest is the commit point** — everything a manifest references
   is fully written before the manifest becomes visible, and
2. **inodes never change under a reader** — directory renames move names,
   not file contents.

``pin_index`` turns those properties into a consistent read view WITHOUT a
table format: it reads the root manifest, HARDLINKS exactly the files that
manifest commits into a fresh directory, then re-reads the manifest and
retries if a writer published in between (optimistic concurrency, the same
loop an Iceberg commit runs on the writer side). Hardlinks share inodes, so
the view keeps working even if an append or compaction later renames the
directories its files came from. The result is a fully functional index
directory: every query/aggregation in this package runs against it
unchanged.

What the manifest commits — the selection rules:

- ``docs``:     only ``batch=base`` plus the manifest's published
                ``appends`` partitions (an in-flight append's batch
                partition and Spark's staging dirs are excluded by name).
- ``postings``: only hive partitions ``shard < num_shards·(1+len(appends))``
                (each published append j owns shard range
                ``[num_shards·(j+1), num_shards·(j+2))``; an in-flight
                append writes only shards at or beyond the limit).
- ``terms``:    the whole directory — the append publish sequence renames
                the old dictionary aside BEFORE renaming the merged one in,
                so a reader can catch the path absent mid-swap; the retry
                loop handles it (and the post-link manifest recheck catches
                the swap completing underneath the link pass).
- ``deletes``:  the tombstone files present at pin time. Tombstones are
                monotone (append-only membership set, no manifest commit),
                so a delete racing the pin is either fully visible or fully
                invisible — ES's near-real-time refresh semantics.

Unpublished-writer detection: the one window the manifest recheck alone
cannot see is a writer that crashed AFTER its visible mutation but BEFORE
its root-manifest publish — the manifest then never changes, yet the
layout is mid-commit. Every such window leaves a marker, and ``_try_pin``
refuses while one is present (retry → loud error, same remedy as the
writers' own recovery: rerun the unfinished operation):

- ``terms.pre_<rid>`` with ``rid`` not in the manifest's ``appends`` —
  an append swapped the merged dictionary in (df already includes the
  uncommitted batch → torn idf) but never published.
- ``postings.pre_<rid>`` with ``rid`` not in ``compactions``/``refreshes``
  — a compaction/bounds-refresh swapped the postings but never published.
- ``_COMPACTING`` sentinel — compaction folds the appended batches'
  ``docs.shard`` partitions BEFORE its postings swap (no rename marker
  exists yet in that window, but folded docs + unfolded postings would
  silently mis-route filtered-search allow sets), so it brackets the
  whole visible mutation with an explicit sentinel.

Backups of PUBLISHED operations are lineage, not damage (append keeps
``terms.pre_<rid>`` forever); they never block a pin.

Scale notes: one ``link(2)`` per file plus one JSON read — no data copied,
no Spark job. At lakehouse scale this whole module is replaced by the table
format's snapshot ids (``sources/tables.py``); the point here is that the
ISOLATION CONTRACT — readers see a committed snapshot, never a torn one —
holds on the raw layout too, and is testable without the Iceberg runtime
(which this sandbox cannot fetch). Reference analogue: ES searchers hold a
point-in-time segment set by refcounting segment files while merges replace
them (the es-data volume of /root/reference/docker-compose.yml:21-27);
hardlinks are the filesystem's refcount.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from .manifest import MANIFEST_NAME, read_manifest

PIN_MARKER = "_PINNED.json"
COMPACTING_SENTINEL = "_COMPACTING"
_SKIP_PREFIXES = ("_temporary", ".spark-staging", "_SUCCESS.crc")


def _want(name: str) -> bool:
    if name.endswith(".tmp") or name.endswith(".crc"):
        return False
    return not any(name.startswith(p) for p in _SKIP_PREFIXES)


def _link_tree(src_dir: str, dst_dir: str, keep_sub=None) -> int:
    """Hardlink (copy on cross-device) every wanted file under ``src_dir``
    into the same relative layout under ``dst_dir``. ``keep_sub(relpath)``
    filters first-level hive partition dirs; top-level files (stage
    manifest, _SUCCESS) always travel. Returns files linked."""
    n = 0
    for dirpath, dirs, names in os.walk(src_dir):
        dirs[:] = [d for d in dirs if _want(d)]
        rel_dir = os.path.relpath(dirpath, src_dir)
        if keep_sub is not None and rel_dir != ".":
            top = rel_dir.split(os.sep, 1)[0]
            if not keep_sub(top):
                dirs[:] = []
                continue
        for name in sorted(names):
            if not _want(name):
                continue
            src = os.path.join(dirpath, name)
            out_dir = dst_dir if rel_dir == "." else os.path.join(dst_dir, rel_dir)
            os.makedirs(out_dir, exist_ok=True)
            dst = os.path.join(out_dir, name)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
            n += 1
    return n


def _shard_limit(meta: dict) -> int:
    num_shards = int(meta["config"]["num_shards"])
    return num_shards * (1 + len(meta.get("appends") or []))


def _try_pin(index_dir: str, pin_dir: str) -> tuple[dict, int]:
    """One optimistic attempt: manifest → link committed files → recheck.
    Raises ``_Retry`` if a writer published in between."""
    meta = read_manifest(index_dir)
    if not meta:
        raise ValueError(f"no index manifest at {index_dir}")
    for stage in ("docs", "terms", "postings"):
        # os.walk is silent on a missing root — an absent stage dir means a
        # publish rename is in flight (or a crashed append awaits rerun)
        if not os.path.isdir(os.path.join(index_dir, stage)):
            raise _Retry(f"stage dir {stage!r} absent (publish in flight)")
    # unpublished-writer markers: a writer crashed (or is publishing right
    # now) between its visible mutation and its root-manifest publish — the
    # manifest recheck alone cannot see this window (module docstring)
    if os.path.exists(os.path.join(index_dir, COMPACTING_SENTINEL)):
        raise _Retry("compaction in flight or crashed (_COMPACTING present)")
    published = {
        "terms.pre_": set(meta.get("appends") or []),
        "postings.pre_": set(meta.get("compactions") or [])
        | set(meta.get("refreshes") or []),
    }
    for name in os.listdir(index_dir):
        for prefix, ok in published.items():
            if name.startswith(prefix) and name[len(prefix):] not in ok:
                raise _Retry(
                    f"{name} has no published manifest entry (writer "
                    "mid-publish or crashed — rerun it to completion)")
    batches = {"base", *(meta.get("appends") or [])}
    limit = _shard_limit(meta)

    def keep_docs(part: str) -> bool:
        return (not part.startswith("batch=")) or part[len("batch="):] in batches

    def keep_postings(part: str) -> bool:
        if not part.startswith("shard="):
            return True
        try:
            return int(part[len("shard="):]) < limit
        except ValueError:
            return False

    os.makedirs(pin_dir)
    linked = 0
    try:
        linked += _link_tree(os.path.join(index_dir, "docs"),
                             os.path.join(pin_dir, "docs"), keep_docs)
        linked += _link_tree(os.path.join(index_dir, "terms"),
                             os.path.join(pin_dir, "terms"))
        linked += _link_tree(os.path.join(index_dir, "postings"),
                             os.path.join(pin_dir, "postings"), keep_postings)
        deletes = os.path.join(index_dir, "deletes")
        if os.path.isdir(deletes):
            linked += _link_tree(deletes, os.path.join(pin_dir, "deletes"))
    except FileNotFoundError as e:
        # a publish rename moved a directory mid-walk (e.g. the terms swap
        # window) — roll back and retry against the new manifest
        shutil.rmtree(pin_dir, ignore_errors=True)
        raise _Retry(str(e)) from e
    meta_after = read_manifest(index_dir)
    if meta_after != meta:
        shutil.rmtree(pin_dir, ignore_errors=True)
        raise _Retry("manifest changed during pin")
    return meta, linked


class _Retry(Exception):
    pass


def pin_index(index_dir: str, pin_dir: str, max_retries: int = 8,
              _between=None) -> dict:
    """Materialize a consistent, immutable read view of ``index_dir`` at
    ``pin_dir`` (which must not exist). Returns a summary with the pinned
    manifest. The view is a complete index directory — pass ``pin_dir`` to
    ``search()`` / ``load_index()`` / any aggregation as usual. Concurrent
    appends to the source are invisible to the view; release it with
    :func:`unpin_index`.

    ``_between`` is a test seam invoked after linking and before the
    manifest recheck (deterministic coverage of the retry path)."""
    if os.path.exists(pin_dir):
        raise ValueError(f"pin target {pin_dir} already exists")
    last = None
    for attempt in range(max_retries):
        try:
            meta, linked = _try_pin(index_dir, pin_dir)
        except _Retry as e:
            last = str(e)
            # a LIVE writer's mutation→publish window is milliseconds; a
            # short growing backoff lets it land. A crashed writer never
            # publishes — exhaust and raise the loud error below.
            time.sleep(0.05 * (attempt + 1))
            continue
        if _between is not None:
            cb, _between = _between, None
            cb()
            meta_after = read_manifest(index_dir)
            if meta_after != meta:
                shutil.rmtree(pin_dir, ignore_errors=True)
                last = "manifest changed during pin (test seam)"
                continue
        # publish the view: root manifest (readable only once fully built),
        # then the pin marker recording provenance
        with open(os.path.join(pin_dir, MANIFEST_NAME), "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True, default=str)
        with open(os.path.join(pin_dir, PIN_MARKER), "w") as f:
            json.dump({"source": os.path.abspath(index_dir),
                       "n_docs": meta.get("n_docs"),
                       "appends": meta.get("appends") or [],
                       "files_linked": linked}, f, indent=2, sort_keys=True)
        return {"pin_dir": pin_dir, "files_linked": linked,
                "n_docs": meta.get("n_docs"),
                "appends": meta.get("appends") or []}
    raise RuntimeError(
        f"pin_index could not obtain a consistent snapshot of {index_dir} "
        f"after {max_retries} attempts (last: {last}); a writer is "
        "publishing continuously, or the index is mid-crash-recovery — "
        "rerun the unfinished operation first"
    )


def unpin_index(pin_dir: str) -> None:
    """Release a pinned view. Refuses to remove a directory that
    ``pin_index`` did not create (no marker), so a typo'd path can never
    delete a real index."""
    if not os.path.exists(os.path.join(pin_dir, PIN_MARKER)):
        raise ValueError(f"{pin_dir} has no {PIN_MARKER}; not a pinned view")
    shutil.rmtree(pin_dir)
