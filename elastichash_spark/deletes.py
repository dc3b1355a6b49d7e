"""ES ``_delete_by_query`` analogue: tombstone soft deletes + expunge merge.

Lucene's deletion semantics, mirrored deliberately (the reference runs on
exactly this machinery whenever its app deletes or re-imports images —
``/root/reference/dh/app/views.py`` index maintenance):

- :func:`delete_by_query` marks matching docs deleted. They stop appearing
  in ANY query result immediately, but corpus statistics (N, df, avgdl —
  hence idf and the scores of surviving docs) keep counting them until a
  merge, so a soft delete never moves a surviving doc's score. This is
  Lucene's live-docs bitset behavior, not a simplification.
- :func:`expunge_deletes` is the merge: a physical rebuild from the index's
  own forward store minus tombstoned docs, with statistics recomputed
  (surviving scores shift, exactly as after a Lucene ``forcemerge`` with
  ``only_expunge_deletes``).

Storage model: tombstones are a SET of docIDs under ``<index>/deletes/``
(parquet, append-mode). Duplicate rows are harmless — every consumer treats
the directory as a membership set via anti-join — so a crashed-and-rerun
delete can only re-append docIDs it already wrote, never corrupt. The
directory's existence is the signal queries act on (no manifest flag to
fall out of sync with the data); the root manifest's ``deleted`` field is
informational.

Scale shape: ``delete_by_query`` is one pruned docs-stage scan plus one
anti-join against prior tombstones (newly-deleted count is exact, as ES
reports). Query-time masking rides the existing filter-context allow-set
path — each shard's live docIDs shuffle WITH that shard's postings, no
broadcast of anything corpus-sized. ``expunge_deletes`` is one
``build_index`` over the anti-joined forward store.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .manifest import read_manifest, write_manifest


def _deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The index's tombstone set as DataFrame(docID), or None if the index
    has never had a delete. Rows may repeat (append-mode storage); every
    consumer is an anti-join, for which multiplicity is irrelevant."""
    d = _deletes_dir(index_dir)
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return None
    return spark.read.parquet(d).select("docID")


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    predicate: str | Column,
) -> int:
    """ES ``_delete_by_query``: soft-delete every doc matching ``predicate``
    (a SQL string or Column over the docs-stage columns — the input-table
    metadata plus docID/doclen, the same surface ``doc_filter`` queries).
    Returns the number of NEWLY deleted docs (already-tombstoned docs do
    not recount, matching ES's ``deleted`` response field). Idempotent:
    rerunning the same predicate returns 0 and appends nothing."""
    meta = read_manifest(index_dir)
    if not meta:
        raise ValueError(f"no index manifest at {index_dir}")
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    hit = docs.where(predicate).select("docID").distinct()
    prior = load_tombstones(spark, index_dir)
    if prior is not None:
        hit = hit.join(prior, "docID", "left_anti")
    hit = hit.persist()
    try:
        n = hit.count()
        if n:
            hit.write.mode("append").parquet(_deletes_dir(index_dir))
    finally:
        hit.unpersist()
    if n:
        write_manifest(index_dir, {**meta, "deleted": True})
    return n


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    predicate: str | Column,
    new_text: str | Column,
    run_id: str = "update0",
) -> dict:
    """ES ``_update_by_query``: re-index every live doc matching
    ``predicate`` with its text rewritten by ``new_text`` (a SQL string or
    Column evaluated over the doc's stored row — text plus metadata).
    Exactly Lucene's mechanics, built from the two primitives that already
    exist: the new versions are APPENDED as a batch (same external key,
    fresh internal docID, statistics merged — :func:`~.append.append_index`)
    and the old versions are TOMBSTONED (:func:`delete_by_query`). Corpus
    statistics therefore count BOTH versions until an expunge merge, which
    is ES's documented behavior after ``_update_by_query`` (deleted docs
    linger in ``docs.deleted`` and keep weighing on idf/avgdl).

    Ordering mirrors ES's per-doc new-version-first swap: the append
    publishes BEFORE the tombstones land, so a crash between the two leaves
    both versions briefly visible (the refresh-window analogue), never a
    missing doc. Rerunning the same ``run_id`` finishes the job: the old-
    version set is recomputed from ``predicate AND batch != run_id AND NOT
    tombstoned`` — rerun-stable because the appended batch is excluded by
    its hive partition key — the append short-circuits off its completed
    manifest, and the tombstone step is idempotent. ``new_text`` must be
    deterministic for this to hold. Returns ``{"updated": n}``.

    The append contract's key-disjointness clause is deliberately relaxed
    here: the new version reuses the external key, and uniqueness of the
    LIVE view is restored by the tombstone step — chained updates then work
    naturally (the next update matches the live v2, appends v3, tombstones
    v2). ``search`` composes both flags (appended ⇒ drift-safe bounds,
    tombstoned ⇒ allow-set masking).
    """
    from .append import append_index

    meta = read_manifest(index_dir)
    if not meta:
        raise ValueError(f"no index manifest at {index_dir}")
    docs_meta = read_manifest(os.path.join(index_dir, "docs"))
    if not docs_meta or "id_cols" not in docs_meta:
        raise ValueError(f"no index docs manifest at {index_dir}")
    id_cols = list(docs_meta["id_cols"])
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    txt = F.expr(new_text) if isinstance(new_text, str) else new_text
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    old = docs.where(pred).where(F.col("batch") != F.lit(run_id))
    tomb = load_tombstones(spark, index_dir)
    if tomb is not None:
        old = old.join(tomb, "docID", "left_anti")

    # stage the new versions OUTSIDE the docs table (append_index writes
    # into the docs dir it would otherwise also be reading — Spark refuses
    # read-from/overwrite-to the same root); updates/ keeps the staging out
    # of appends/, whose directory listing is the foreign-unfinished guard
    staging = os.path.join(index_dir, "updates", run_id)
    old.select(*id_cols, txt.alias("text")).write.mode("overwrite").parquet(
        staging)
    new_docs = spark.read.parquet(staging)
    n = new_docs.count()
    if n == 0:
        return {"updated": 0}
    append_index(spark, new_docs, index_dir, run_id=run_id, id_cols=id_cols)
    deleted = delete_by_query(
        spark, index_dir, pred & (F.col("batch") != F.lit(run_id)))
    if deleted != n:  # pragma: no cover - rerun-after-crash path
        # first run: deleted == n. Rerun after a crash between append and
        # tombstone: the append short-circuited and delete finishes the
        # remainder (deleted <= n). Anything else would be a logic error,
        # but both legitimate cases end fully consistent.
        pass
    return {"updated": n}


def expunge_deletes(
    spark: SparkSession,
    src_index_dir: str,
    dst_index_dir: str,
    config=None,
    resume: bool = False,
    run_id: str = "expunge0",
) -> dict:
    """Lucene ``forcemerge only_expunge_deletes``: physically rebuild the
    index WITHOUT its tombstoned docs, into ``dst_index_dir`` (the source
    stays readable throughout, like :func:`~.build.reindex`). Statistics
    are recomputed over the survivors, so scores shift exactly as after a
    real segment merge; the tombstone set does not carry over. Raises if
    the index has no tombstones — an expunge that would silently copy the
    index is a caller bug."""
    from .build import IndexConfig, build_index

    if os.path.abspath(src_index_dir) == os.path.abspath(dst_index_dir):
        raise ValueError("expunge requires dst_index_dir != src_index_dir")
    tomb = load_tombstones(spark, src_index_dir)
    if tomb is None:
        raise ValueError(
            f"{src_index_dir} has no tombstones; use reindex for a plain "
            "rebuild")
    docs_meta = read_manifest(os.path.join(src_index_dir, "docs"))
    if not docs_meta or "id_cols" not in docs_meta:
        raise ValueError(f"no index docs manifest at {src_index_dir}")
    id_cols = list(docs_meta["id_cols"])
    live = (
        spark.read.parquet(os.path.join(src_index_dir, "docs"))
        .join(tomb, "docID", "left_anti")
        .select(*id_cols, "text")
    )
    return build_index(
        spark, live, dst_index_dir, config or IndexConfig(),
        resume=resume, run_id=run_id, id_cols=id_cols, text_col="text",
    )
