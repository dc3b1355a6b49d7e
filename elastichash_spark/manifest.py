"""Checkpoint manifests — the build's resumability + lineage record.

The reference has no resume story (a failed import is rerun from scratch; its
closest artifact is the ``.failed``/``.errors`` side files of
``/root/reference/model/prepare_model/inference_csv.py:163-165,206-213``).
Per the north rule this engine is stronger: every build stage writes a
manifest AFTER its output is durably written, carrying run lineage and
per-partition row/byte metrics; a restarted build skips stages whose manifest
matches the current run's config + upstream lineage.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

MANIFEST_NAME = "_MANIFEST.json"


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def write_manifest(stage_dir: str, payload: dict[str, Any]) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    payload = dict(payload)
    payload.setdefault("written_at_unix", time.time())
    tmp = manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, manifest_path(stage_dir))  # atomic publish


def read_manifest(stage_dir: str) -> dict[str, Any] | None:
    p = manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_complete(stage_dir: str, expect: dict[str, Any]) -> bool:
    """A stage is reusable iff its manifest exists and every expected
    config/lineage key matches (row counts etc. are informational)."""
    m = read_manifest(stage_dir)
    if m is None:
        return False
    return all(m.get(k) == v for k, v in expect.items())
