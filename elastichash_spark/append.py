"""Incremental index append — new documents without a full rebuild.

A 10^12-turn corpus is never rebuilt from zero; the reference sidesteps the
problem (ES handles incremental indexing internally; a failed ElasticHash
import is simply rerun, ``dh/tools/import_csv.py``). Here append is a
first-class engine operation with the same manifest/resume discipline as the
build:

- new docs get docIDs ``[n_docs, n_docs + m)`` (deterministic ordinal over
  the batch, same ``doc_order`` policy as the base build) and land in FRESH
  shard ids — existing postings files are never rewritten; the postings
  table just gains new hive partitions.
- the term dictionary is merged: existing terms keep their termIDs (only
  their df grows), new terms extend the id space; idf and avgdl are
  recomputed under the merged corpus statistics.
- **statistics drift**: per-block ``max_impact`` was computed under the
  build-time (idf, avgdl), which the append just changed — for OLD blocks it
  is no longer an upper bound (idf can grow when n_docs grows). The postings
  schema therefore carries idf/avgdl-free ``(max_tf, min_dl)`` per block
  (build.py), and after any append the query kernel rebuilds a SAFE bound at
  query time: ``idf_now · tf_part(max_tf, min_dl, avgdl_now)`` ≥ the impact
  of every member posting (tf_part is increasing in tf, decreasing in dl).
  Slightly looser than the exact joint maximum — pruning stays safe, exact
  scores are computed from decoded postings under current stats either way.

Skew note: the append pipeline shuffles the batch once by (termID, shard)
and block-encodes in place — for append batches comparable to the base
corpus, run a fresh ``build_index`` into new shard ids instead (the salted
repartition-and-merge handles hot-term skew there).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import asdict

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, scoring
from .build import POSTINGS_SCHEMA, IndexConfig, _stage
from .ids import with_ordinal, with_ordinal_lazy
from .manifest import read_manifest, stage_complete, write_manifest
from .tokenize import TF_EXPLODED_SCHEMA, make_tf_explode_kernel, tokens_expr


def _blob_concat(b: pa.RecordBatch) -> memoryview:
    """Zero-copy concatenation of a batch's ``blob`` values: a binary
    array lays its values end-to-end, so the bytes between the first and
    last offsets ARE the blobs back-to-back — ready for one
    ``decode_runs_concat`` call over the whole batch."""
    blob = b.column(b.schema.get_field_index("blob"))
    offs = np.frombuffer(blob.buffers()[1], dtype=np.int32)
    data = memoryview(blob.buffers()[2])
    return data[offs[blob.offset]: offs[blob.offset + len(blob)]]


def _encode_blocks_factory(block_size: int, avgdl: float, max_batch_bytes: int = 1 << 30):
    """mapInArrow kernel: partition rows sorted by (termID, shard, docID) ->
    final posting blocks (adaptive sizes) with block statistics. The direct
    (unsalted) form of the build's runs+merge pair — right-sized for append
    batches that are small relative to the base corpus."""

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .session import disable_thp

        disable_thp()
        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        if tbl.num_rows == 0:
            return
        term = tbl.column("termID").to_numpy()
        shard = tbl.column("shard").to_numpy()
        doc = tbl.column("docID").to_numpy()
        tf = tbl.column("tf").to_numpy()
        dl = tbl.column("doclen").to_numpy()
        idf = tbl.column("idf").to_numpy()
        change = (np.diff(term) != 0) | (np.diff(shard) != 0)
        gstarts = np.concatenate([[0], np.flatnonzero(change) + 1])
        gends = np.concatenate([gstarts[1:], [len(term)]])
        bsz = codec.adaptive_block_sizes(gends - gstarts, block_size)
        bstarts, bends, block_ids, _ = codec.block_bounds(gstarts, gends, bsz)
        data, offs = codec.encode_runs_grouped(doc, tf, dl, bstarts, bends)
        impacts = idf * scoring.tf_part_np(tf, dl, avgdl)
        from .build import _blob_batches

        yield from _blob_batches(
            {
                "termID": term[bstarts].astype(np.int64, copy=False),
                "shard": shard[bstarts].astype(np.int32),
                "block_id": block_ids.astype(np.int32),
                "n": (bends - bstarts).astype(np.int32),
                "first_docID": doc[bstarts].astype(np.int64, copy=False),
                "last_docID": doc[bends - 1].astype(np.int64, copy=False),
                "max_impact": np.maximum.reduceat(impacts, bstarts),
                "max_tf": np.maximum.reduceat(tf, bstarts).astype(np.int32),
                "min_dl": np.minimum.reduceat(dl, bstarts).astype(np.int32),
            },
            data, offs, max_batch_bytes,
        )

    return encode


def append_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    run_id: str,
    id_cols: list[str] | None = None,
    text_col: str = "text",
) -> dict:
    """Append ``new_docs`` to the index at ``index_dir``.

    Idempotent per ``run_id`` — every write a rerun repeats lands in
    rerun-stable locations it OVERWRITES rather than duplicates:

    - shard ids come from the manifest, not from scanning the docs table:
      append j (0-based) owns exactly ``[num_shards·(j+1), num_shards·(j+2))``
      — deterministic across reruns, so a crashed run's postings partitions
      are superseded by the rerun's dynamic partition overwrite (and the
      corpus-sized max(shard) scan is gone).
    - the docs table is hive-partitioned by ``batch`` (``base`` for the
      build, the run_id per append); the batch's docs land via dynamic
      partition overwrite of their own partition — a rerun replaces, never
      appends twice.
    - the term-dictionary swap keeps a ``.pre_<run_id>`` backup; on rerun of
      an unfinished append the backup is restored first, so the merge always
      reads pre-append statistics (a crash between the two renames or after
      the swap cannot double-count df).
    - manifests publish append-summary THEN root meta; a crash between the
      two is finished by the rerun (summary present + run_id missing from
      the root's appends list → root meta rebuilt from the summary).

    Readers running CONCURRENTLY with an append: a reader pointed straight
    at ``index_dir`` may observe the batch partially (new docs before new
    postings). Readers that need one committed state pin a snapshot view
    first (``pin.pin_index`` — hardlink view of exactly the files the root
    manifest commits, the engine-level analogue of an Iceberg snapshot
    read; ``jobs/run_queries.py --pin``); with a real lakehouse catalog the
    same isolation comes from Iceberg commits (`sources/tables.py`). The
    caller guarantees batch keys are disjoint from already-indexed keys.
    """
    import shutil

    id_cols = id_cols or ["conv_id", "turn_idx"]
    meta = read_manifest(index_dir)
    config = IndexConfig(**meta["config"])
    append_dir = os.path.join(index_dir, "appends", run_id)
    expect = {"stage": "append", "run_id": run_id, "config": asdict(config)}
    docs_dir, terms_dir = _stage(index_dir, "docs"), _stage(index_dir, "terms")
    postings_dir = _stage(index_dir, "postings")
    terms_bak = terms_dir + f".pre_{run_id}"
    done_appends = list(meta.get("appends") or [])

    # ---- foreign-unfinished-append guard: recovery below is keyed to THIS
    # run_id only. If a DIFFERENT append crashed mid-flight (its terms.pre_*
    # backup or appends/<id> directory exists but the root manifest never
    # published it), starting this append would merge df against a
    # half-published dictionary, reuse the crashed run's shard range, and
    # leave its orphaned docs partition with overlapping docIDs. Refuse loudly
    # instead: the unfinished append must be rerun to completion (its own
    # recovery is idempotent) or its leftovers removed first. Backups of
    # PUBLISHED appends are lineage, not damage — they stay.
    appends_root = os.path.join(index_dir, "appends")
    unfinished: set[str] = set()
    prefix = "terms.pre_"
    for name in os.listdir(index_dir):
        if name.startswith(prefix):
            rid = name[len(prefix):]
            if rid != run_id and rid not in done_appends:
                unfinished.add(rid)
    if os.path.isdir(appends_root):
        for name in os.listdir(appends_root):
            if name != run_id and name not in done_appends:
                unfinished.add(name)
    if unfinished:
        ids = ", ".join(sorted(unfinished))
        raise RuntimeError(
            f"unfinished append(s) [{ids}] detected at {index_dir}: rerun "
            f"each with append_index(..., run_id=<id>) to completion (the "
            f"per-run recovery is idempotent), or delete appends/<id> and "
            f"terms.pre_<id> to abandon it, before starting append "
            f"'{run_id}'"
        )

    # ---- crash recovery before anything else. Order matters: a COMPLETE
    # summary means the terms swap is the published state (finish the root
    # publish if the crash hit between the two manifests); only an
    # INCOMPLETE run restores the pre-append dictionary from the backup.
    if stage_complete(append_dir, expect):
        summary = read_manifest(append_dir)
        if run_id not in done_appends:
            # crashed between summary and root publish — finish the publish
            write_manifest(
                index_dir,
                {**meta, "n_docs": summary["n_docs"], "avgdl": summary["avgdl"],
                 "n_terms": summary["n_terms"], "appended": True,
                 "appends": done_appends + [run_id], "stage": "meta"},
            )
        return summary
    if os.path.exists(terms_bak):
        # unfinished run crashed during/after the terms swap: restore the
        # pre-append dictionary so the rerun merges against clean statistics
        if os.path.exists(terms_dir):
            shutil.rmtree(terms_dir)
        os.rename(terms_bak, terms_dir)

    n_old = int(meta["n_docs"])
    avgdl_old = float(meta["avgdl"])
    n_terms_old = int(meta["n_terms"])
    # manifest-derived, rerun-stable shard range for this append
    base_shard = config.num_shards * (1 + len(done_appends))

    # ---- batch docs: ordinal (same doc_order policy), offset docIDs, fresh
    # modulo shards; written straight into the docs table's own hive
    # partition (batch=<run_id>) with dynamic overwrite — idempotent
    if config.doc_order == "doclen":
        src = new_docs.withColumn(
            "doclen",
            F.size(tokens_expr(F.col(text_col), config.stopwords,
                               config.stem, config.synonyms)),
        )
        order_cols: list = ["doclen", *id_cols]
    else:
        src = new_docs
        order_cols = list(id_cols)
    docs_b, m, finish = with_ordinal_lazy(src, order_cols, "docID")
    try:
        docs_b = docs_b.withColumn("docID", F.col("docID") + F.lit(n_old))
        docs_b = docs_b.withColumn(
            "shard",
            (F.lit(base_shard) + (F.col("docID") % F.lit(config.num_shards))).cast("int"),
        )
        if config.doc_order != "doclen":
            docs_b = docs_b.withColumn(
                "doclen",
                F.size(tokens_expr(F.col(text_col), config.stopwords,
                                   config.stem, config.synonyms)),
            )
        docs_b.withColumn("batch", F.lit(run_id)).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(docs_dir)
    finally:
        finish()
    from .build import _parquet_rows

    batch_docs_dir = os.path.join(docs_dir, f"batch={run_id}")
    written = _parquet_rows(batch_docs_dir)
    if written != m:
        raise RuntimeError(
            f"append docs wrote {written} rows, ordinal counted {m}; "
            "range partitions recomputed mid-write — rerun the append"
        )
    docs_b = spark.read.parquet(batch_docs_dir)

    # ---- batch tf + merged term dictionary
    tf_b = (
        docs_b.select(
            "docID", F.col(text_col).alias("text"), "shard",
            F.lit(0).cast("int").alias("salt"),
        )
        .mapInArrow(
            make_tf_explode_kernel(config.stopwords, config.stem,
                                   config.synonyms),
            TF_EXPLODED_SCHEMA,
        )
    )
    tf_dir = os.path.join(append_dir, "tf")
    tf_b.write.mode("overwrite").parquet(tf_dir)
    tf_b = spark.read.parquet(tf_dir)

    n_new = n_old + m
    batch_tokens = tf_b.agg(F.sum(F.col("tf").cast("long"))).collect()[0][0] or 0
    avgdl_new = (avgdl_old * n_old + float(batch_tokens)) / n_new if n_new else 0.0

    old_terms = spark.read.parquet(terms_dir).select("term", "termID", "df")
    dfreq_b = tf_b.groupBy("term").agg(F.count("*").alias("df_b"))
    known = (
        old_terms.join(dfreq_b, "term", "left")
        .select(
            "term", "termID",
            (F.col("df") + F.coalesce(F.col("df_b"), F.lit(0))).alias("df"),
        )
    )
    fresh = dfreq_b.join(old_terms, "term", "left_anti").select(
        "term", F.col("df_b").alias("df")
    )
    fresh = with_ordinal(fresh, [("df", "desc"), "term"], "new_rank").select(
        "term", (F.col("new_rank") + F.lit(n_terms_old)).alias("termID"), "df"
    )
    merged = known.unionByName(fresh).withColumn(
        "idf", scoring.idf_col(n_new, F.col("df").cast("double"))
    )
    merged_dir = os.path.join(append_dir, "terms")
    merged.write.mode("overwrite").parquet(merged_dir)
    merged = spark.read.parquet(merged_dir)
    n_terms_new = merged.count()

    # ---- batch postings: one shuffle by (termID, shard), block-encode
    tf_keyed = tf_b.join(merged.select("term", "termID", "idf"), "term").drop("term")
    n_parts = max(2, spark.sparkContext.defaultParallelism * 2)
    blocks = (
        tf_keyed.repartition(n_parts, "termID", "shard")
        .sortWithinPartitions("termID", "shard", "docID")
        .mapInArrow(
            _encode_blocks_factory(config.block_size, avgdl_new,
                                   config.batch_blob_bytes),
            POSTINGS_SCHEMA,
        )
    )
    # fresh shard values -> new hive partitions only; dynamic overwrite makes
    # a crashed rerun replace its own partial partitions and touch nothing old
    blocks.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard").parquet(postings_dir)

    # ---- publish: swap the merged dictionary over the old one, keeping the
    # pre-append backup the entry recovery restores from; then the manifests
    # (summary first — the entry recovery finishes a root publish the crash
    # interrupted). Docs and postings already landed idempotently above.
    os.rename(terms_dir, terms_bak)
    # merged_dir was fully written before the swap; a crash between the two
    # renames leaves terms_dir absent + terms_bak present → entry recovery
    os.rename(merged_dir, terms_dir)

    summary = {
        **expect,
        "rows": m,
        "n_docs": n_new,
        "avgdl": avgdl_new,
        "n_terms": int(n_terms_new),
        "base_shard": base_shard,
    }
    write_manifest(append_dir, summary)
    write_manifest(
        index_dir,
        {
            **meta,
            "n_docs": n_new,
            "avgdl": avgdl_new,
            "n_terms": int(n_terms_new),
            "appended": True,
            "appends": done_appends + [run_id],
            "stage": "meta",
        },
    )
    return summary


def refresh_bounds(spark: SparkSession, index_dir: str,
                   run_id: str = "refresh") -> dict:
    """Post-append compaction of the pruning metadata: recompute every
    block's exact ``max_impact`` under the CURRENT merged (idf, avgdl) and
    clear the ``appended`` flag, restoring fresh-build pruning quality.

    Appends leave the stored per-block ``max_impact`` stale (computed under
    superseded statistics), so the query kernel falls back to the safe but
    looser ``idf·tf_part(max_tf, min_dl)`` bound — worth ~3-5 points of
    block pruning (scripts/append_bench.py). This op decodes each block
    once, takes the exact member-impact maximum under current statistics,
    and rewrites the postings table with ONLY the ``max_impact`` column
    changed (blobs pass through zero-copy). Cheaper than ``reindex`` by
    the whole tokenize + salted-merge pipeline: one postings-sized
    read + write, no corpus scan, no shuffle (tasks stay partition-aligned
    with the hive ``shard=`` layout they read).

    Scale notes: the termID→idf map broadcasts as ONE dense float64 array
    (termIDs are dense ranks), 8 bytes/term — fine to ~10^8-term
    vocabularies; beyond that swap the broadcast for a shuffle join of
    postings against the dictionary. Publish discipline matches append:
    staged write + row-count check, then a backup rename swap; a crash
    between the renames is healed on the next call (backup restored), a
    crash before the root-meta write leaves ``appended`` set — queries
    stay correct under safe bounds and a rerun finishes the publish.

    Rank-identity is untouched either way: bounds only steer PRUNING; exact
    scores always come from decoded postings under current statistics.
    Returns {"blocks": n, "n_docs": ..., "run_id": ...}.
    """
    import shutil

    meta = read_manifest(index_dir)
    postings_dir = _stage(index_dir, "postings")
    backup = postings_dir + f".pre_{run_id}"
    # heal a crash between the two publish renames (postings gone, backup
    # holds the pre-refresh table): restore, then redo the refresh
    if not os.path.isdir(postings_dir) and os.path.isdir(backup):
        os.rename(backup, postings_dir)
    if not meta.get("appended"):
        return {"blocks": 0, "n_docs": int(meta["n_docs"]),
                "run_id": run_id, "skipped": "bounds already exact"}
    avgdl = float(meta["avgdl"])

    terms = spark.read.parquet(_stage(index_dir, "terms")) \
        .select("termID", "idf").toPandas()
    idf_arr = np.zeros(int(terms["termID"].max()) + 1, dtype=np.float64)
    idf_arr[terms["termID"].to_numpy(dtype=np.int64)] = \
        terms["idf"].to_numpy(dtype=np.float64)
    b_idf = spark.sparkContext.broadcast(idf_arr)

    def recompute(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        idf = b_idf.value
        for b in batches:
            if b.num_rows == 0:
                continue
            tids = b.column(b.schema.get_field_index("termID")).to_numpy()
            ns = b.column(b.schema.get_field_index("n")).to_numpy() \
                .astype(np.int64, copy=False)
            # one vectorized decode of the whole batch (median block is a
            # few postings — a per-block loop costs more than the decode;
            # same fix as postings_docids, measured in BENCH.md)
            if ns.min() <= 0:
                raise ValueError("empty posting block — reduceat segment "
                                 "maxima require n >= 1 per block")
            _doc, tf, dl, rs = codec.decode_runs_concat(_blob_concat(b), ns)
            impact = np.repeat(idf[tids], ns) * scoring.tf_part_np(tf, dl, avgdl)
            mx = np.maximum.reduceat(impact, rs[:-1])
            yield b.set_column(
                b.schema.get_field_index("max_impact"),
                pa.field("max_impact", pa.float64()),
                pa.array(mx),
            )

    posts = spark.read.parquet(postings_dir)
    n_before = posts.count()
    staged = os.path.join(index_dir, f"refresh_{run_id}")
    shutil.rmtree(staged, ignore_errors=True)
    # partition-aligned: input files are per-shard, so each task rewrites
    # rows of its own shard — partitionBy adds no shuffle. Output schema is
    # the reader's own (hive layout appends the shard partition column
    # last, a different column ORDER than POSTINGS_SCHEMA).
    posts.mapInArrow(recompute, posts.schema) \
        .write.mode("overwrite").partitionBy("shard").parquet(staged)
    from .build import _parquet_rows

    n_after = _parquet_rows(staged)
    if n_after != n_before:
        raise RuntimeError(
            f"refresh_bounds wrote {n_after} block rows, expected "
            f"{n_before}; staged output left at {staged} for inspection")
    if os.path.isdir(backup):
        shutil.rmtree(backup)  # stale backup from a finished prior refresh
    os.rename(postings_dir, backup)
    os.rename(staged, postings_dir)
    write_manifest(
        index_dir,
        {**meta, "appended": False, "stage": "meta",
         "refreshes": list(meta.get("refreshes") or []) + [run_id]},
    )
    shutil.rmtree(backup, ignore_errors=True)
    return {"blocks": int(n_after), "n_docs": int(meta["n_docs"]),
            "run_id": run_id}


def compact_index(spark: SparkSession, index_dir: str,
                  run_id: str = "compact") -> dict:
    """LSM-style merge compaction: fold every append generation's postings
    back into the base shard layout and recompute exact per-block bounds
    under the merged statistics — the full fresh-build pruning economics
    without re-tokenizing a single document.

    Why ``refresh_bounds`` alone is not enough (measured,
    scripts/append_bench.py): the post-append pruning gap is STRUCTURAL,
    not bound looseness — each append parks its postings in fresh shard
    ids, so a term's postings fragment across per-generation runs with
    shallow per-shard top-k thresholds and short block-max decay spans.
    Compaction decodes the postings (the index's own data; the corpus text
    is never touched), folds every doc to its base-layout shard
    (``docID % num_shards`` — the doclen-interleaved assignment the build
    uses), re-encodes full-width per-(term, shard) block runs with exact
    ``max_impact`` under current (idf, avgdl), and swaps the postings table.
    Appended docs keep their docIDs (each batch is doclen-ascending within
    its own docID range, so block-max decay still holds piecewise per
    generation inside the merged runs) — results are rank-identical before
    and after, this only changes layout and pruning quality.

    Cost: one postings-sized decode + one (termID, shard) shuffle + one
    encode — the tokenize, docs-stage, and dictionary work of ``reindex``
    is all skipped. The appended batches' rows in the docs table get their
    ``shard`` column folded too (their own hive partitions only — the base
    partition is already in base layout), keeping the filtered-search
    allow-set co-location correct.

    Restrictions: ``doc_order='doclen'`` indexes only (the production
    config; key-ordered range sharding would reshard the BASE docs too —
    use ``reindex`` there). Single-writer like append: readers concurrent
    with the swap may see mixed layouts — pin a snapshot view first
    (``pin.pin_index``) or read through a lakehouse table format.
    Idempotent: the docs-partition rewrite
    is a dynamic-partition overwrite and the postings swap heals on
    re-entry exactly like ``refresh_bounds``.
    """
    import math
    import shutil

    meta = read_manifest(index_dir)
    config = IndexConfig(**meta["config"])
    if config.doc_order != "doclen":
        raise ValueError(
            "compact_index supports doc_order='doclen' indexes; a "
            "key-ordered index reshards its base range partitions too — "
            "run build.reindex instead")
    postings_dir = _stage(index_dir, "postings")
    docs_dir = _stage(index_dir, "docs")
    backup = postings_dir + f".pre_{run_id}"
    if not os.path.isdir(postings_dir) and os.path.isdir(backup):
        os.rename(backup, postings_dir)  # heal a mid-swap crash
    # gate on UNFOLDED append generations, not the 'appended' flag — a
    # prior refresh_bounds clears the flag without de-fragmenting layout
    folded = set(meta.get("folded_appends") or [])
    pending = [r for r in (meta.get("appends") or []) if r not in folded]
    if not pending:
        # nothing mid-flight by single-writer discipline → any leftover
        # sentinel/backup is from a run that crashed AFTER its manifest
        # publish; clear them so pins stop refusing
        from .pin import COMPACTING_SENTINEL

        stale = os.path.join(index_dir, COMPACTING_SENTINEL)
        if os.path.exists(stale):
            os.remove(stale)
        shutil.rmtree(backup, ignore_errors=True)
        return {"blocks": 0, "run_id": run_id,
                "skipped": "no append generations to fold"}
    num_shards = int(config.num_shards)
    avgdl = float(meta["avgdl"])

    terms = spark.read.parquet(_stage(index_dir, "terms")) \
        .select("termID", "idf").toPandas()
    idf_arr = np.zeros(int(terms["termID"].max()) + 1, dtype=np.float64)
    idf_arr[terms["termID"].to_numpy(dtype=np.int64)] = \
        terms["idf"].to_numpy(dtype=np.float64)
    b_idf = spark.sparkContext.broadcast(idf_arr)

    exploded_schema = ("termID long, shard int, docID long, tf int, "
                       "doclen int, idf double")

    def explode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        idf = b_idf.value
        for b in batches:
            if b.num_rows == 0:
                continue
            tids = b.column(b.schema.get_field_index("termID")).to_numpy()
            ns = b.column(b.schema.get_field_index("n")).to_numpy() \
                .astype(np.int64, copy=False)
            # whole-batch decode (see refresh_bounds / postings_docids)
            d, tf, dl, _rs = codec.decode_runs_concat(_blob_concat(b), ns)
            t = np.repeat(tids.astype(np.int64), ns)
            yield pa.RecordBatch.from_arrays(
                [pa.array(t), pa.array((d % num_shards).astype(np.int32)),
                 pa.array(d), pa.array(tf), pa.array(dl), pa.array(idf[t])],
                names=["termID", "shard", "docID", "tf", "doclen", "idf"],
            )

    posts = spark.read.parquet(postings_dir)
    n_postings = posts.agg(F.sum(F.col("n").cast("long"))).collect()[0][0] or 0
    rows = posts.mapInArrow(explode, exploded_schema)
    n_parts = max(2, spark.sparkContext.defaultParallelism * 2)
    staged = os.path.join(index_dir, f"compact_{run_id}")
    shutil.rmtree(staged, ignore_errors=True)
    (
        rows.repartition(n_parts, "termID", "shard")
        .sortWithinPartitions("termID", "shard", "docID")
        .mapInArrow(
            _encode_blocks_factory(config.block_size, avgdl,
                                   config.batch_blob_bytes),
            POSTINGS_SCHEMA,
        )
        .write.mode("overwrite").partitionBy("shard").parquet(staged)
    )
    n_after = spark.read.parquet(staged) \
        .agg(F.sum(F.col("n").cast("long"))).collect()[0][0] or 0
    if n_after != n_postings:
        raise RuntimeError(
            f"compact_index re-encoded {n_after} postings, expected "
            f"{n_postings}; staged output left at {staged} for inspection")

    # sentinel brackets the VISIBLE mutations (docs fold → postings swap →
    # manifest): the docs fold rewrites published partitions with no rename
    # marker, so a concurrent pin_index could otherwise link folded docs
    # against unfolded postings — pin.py refuses while this file exists
    from .pin import COMPACTING_SENTINEL

    sentinel = os.path.join(index_dir, COMPACTING_SENTINEL)
    with open(sentinel, "w") as f:
        json.dump({"run_id": run_id}, f)

    # fold the appended batches' docs.shard column (their own hive
    # partitions only; idempotent dynamic overwrite)
    for rid in list(meta.get("appends") or []):
        bdir = os.path.join(docs_dir, f"batch={rid}")
        if not os.path.isdir(bdir):
            continue
        batch = spark.read.parquet(bdir).withColumn(
            "shard", (F.col("docID") % F.lit(num_shards)).cast("int"))
        batch.withColumn("batch", F.lit(rid)).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch").parquet(docs_dir)

    if os.path.isdir(backup):
        shutil.rmtree(backup)
    os.rename(postings_dir, backup)
    os.rename(staged, postings_dir)
    n_blocks = spark.read.parquet(postings_dir).count()
    write_manifest(
        index_dir,
        {**meta, "appended": False, "stage": "meta",
         "compactions": list(meta.get("compactions") or []) + [run_id],
         "folded_appends": sorted(folded | set(pending))},
    )
    shutil.rmtree(backup, ignore_errors=True)
    os.remove(sentinel)
    return {"blocks": int(n_blocks), "postings": int(n_after),
            "run_id": run_id}
