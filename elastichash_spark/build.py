"""Index build — offline, parallel, staged, resumable.

Transposes the reference's bulk index build (``/root/reference/dh/tools/
import_csv.py``: CSV scan -> per-row doc transform -> 4 threads x 40-doc
batched ``_bulk`` sinks into 3 ES shards) into a Spark-first pipeline:

  stage docs      tokenize (Arrow UDF) + deterministic docID + doc shard
  stage mruns     map-side partial posting runs: tokenize-explode -> sort ->
                  delta+varbyte encode per (term, shard, salt = docID % S),
                  all inside one Arrow kernel — exploded postings never
                  leave the map task; salt-partitioned output
  stage terms     corpus stats (N, avgdl, df) + deterministic termID + idf
                  (df = Σ run lengths per term, a run-metadata scan)
  stage runs/S=s  per salt bucket: term -> termID dictionary join over run
                  rows + repartition by (termID, shard) — the salted
                  repartition, moving ~10x fewer rows and ~5x fewer bytes
                  than exploded postings; postings stay compressed
  stage postings  merge every salted run per (termID, shard) — the merge
                  kernel accepts arbitrary run multiplicity, so this is the
                  build's ONE decode-sort-encode pass — into final
                  128-posting blocks with per-block max BM25 impact metadata
                  (the block-max WAND analogue of the reference's precomputed
                  ``nbs`` pruning index, ``dh/tools/create_nbs_index.py``)

Shards are docID ranges — the analogue of the reference's 3 ES shards
(``import_csv.py:31``): every doc's postings live wholly inside one shard, so
query-time scoring is shard-local with a global top-k merge, exactly ES's
per-shard-heap-then-merge execution.

Skew: hot terms (Zipf head) would make a plain repartition-by-term straggle;
runs are therefore built per (termID, shard, salt) with salt = docID % S and
merged in a second pass — the salted repartition-and-merge required by the
north rule. The merged result is provably independent of S (postings are
re-sorted by unique docID), which tests assert byte-identically.

Every stage writes parquet then a manifest (lineage + per-partition rows and
bytes); a rerun of ``build_index`` with the same config skips completed
stages, so a killed build resumes where it stopped (FIXTURES.md §4.7).
"""

from __future__ import annotations

import math
import os
import shutil
import time
from collections.abc import Iterator
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, scoring
from .ids import with_ordinal, with_ordinal_lazy, with_running_total
from .manifest import MANIFEST_NAME, read_manifest, stage_complete, write_manifest
from .tokenize import TOKEN_SPLIT_RE, tokens_expr


@dataclass(frozen=True)
class IndexConfig:
    num_shards: int = 8          # docID-range shards (ES shard analogue)
    salt_buckets: int = 4        # S in the salted repartition-and-merge
    block_size: int = 128        # postings per block (Lucene uses 128)
    run_partitions: int = 0      # shuffle width for run building; 0 = default
    # per-RecordBatch blob payload ceiling (Arrow binary = int32 offsets);
    # kernels chunk their output at row boundaries under this. Tests shrink
    # it to force the multi-batch path; byte-identical output asserted.
    batch_blob_bytes: int = 1 << 30
    # map-side run builder memory bound: exploded (docID, term, tf) rows
    # accumulate in the tokenize kernel up to this count before flushing as
    # encoded runs (~40B/row peak -> ~170 MB at the default). A group split
    # across flushes just yields several runs — the postings merge accepts
    # arbitrary multiplicity, so the knob trades run-metadata volume against
    # executor memory without changing the result (tests shrink it and
    # assert byte-identical indexes).
    map_chunk_rows: int = 1 << 22
    # docID assignment order. "key": the corpus key (stable, append-friendly).
    # "doclen": rank by (doclen, key) — impact-aware assignment: BM25's length
    # normalization makes short docs score higher, so doclen-clustered docIDs
    # give block maxima a monotone-ish decay along each posting list and
    # block-max WAND something to prune (the analogue of impact-ordered /
    # document-reordered indexes; with key order the maxima are flat and
    # pruning is vacuous — measured in BENCH.md round 1).
    doc_order: str = "key"
    # analyzer chain (ES ``analysis`` analogue; tokenize.py module
    # docstring pins the semantics): stopwords dropped after
    # lowercase+split, then the pinned s-stemmer, then the synonym map
    # (post-stem surface -> canonical, index-time contract-merging form).
    # Applied identically by the docs-stage JVM doclen expression, the
    # mruns Arrow kernel, and — via meta.json — the query planner's
    # tokenizer, so an index and its queries always share one analyzer.
    # Part of index_format_tag (any change invalidates caches) and of the
    # manifest lineage.
    stopwords: tuple | list = ()
    stem: bool = False
    synonyms: tuple | list = ()
    # postings-merge fan-out beyond the shard count. Keyed on shard alone,
    # merge parallelism caps at num_shards tasks (measured: the whole stage
    # wall was data movement through those few sorted streams, ~4x slower
    # than the shuffle needed to be). Buckets are df-mass-BALANCED
    # CONTIGUOUS termID ranges (two-pass weighted prefix sum over the term
    # dictionary): balance because termID is df-rank order, so naive ranges
    # would put the whole Zipf head in bucket 0; contiguity so each output
    # file covers a narrow termID range and parquet min/max file skipping
    # keeps working for query-time termID-IN scans (a hash-mod bucket
    # balances equally well but scatters every file across the full termID
    # range). Postings content is IDENTICAL for any value (merge groups
    # stay whole: bucket is a function of termID); tiny builds clamp the
    # effective fan-out by run volume so test-sized indexes keep their
    # plan shape. Worst-case skew is unchanged: a degenerate single-term
    # corpus concentrates its bucket, but that term still splits across
    # num_shards exactly as before.
    merge_buckets: int = 8

    def __post_init__(self):
        # manifests round-trip through JSON, which yields lists; normalize
        # stopwords/synonyms to sorted deduped LISTS so
        # IndexConfig(**meta["config"]) compares/hashes identically to the
        # build-time config (a tuple here would fail every stage_complete
        # resume check against the JSON manifest) and the format tag is
        # order-insensitive
        object.__setattr__(self, "stopwords", sorted(set(self.stopwords)))
        syn = dict((str(k), str(v)) for k, v in self.synonyms)
        object.__setattr__(
            self, "synonyms", sorted([k, v] for k, v in syn.items()))
        # idempotence guards: query planners re-analyze already-analyzed
        # tokens (phrase coarse stage, dis_max clauses), which is only
        # sound if one analyzer pass is a fixpoint. Chained synonyms
        # (a value that is itself a key), canonicals that re-stem, or
        # canonicals in the stop list would silently break that — refuse
        # loudly at construction instead.
        if syn:
            from .tokenize import stem_py

            chained = sorted(set(syn.values()) & set(syn))
            if chained:
                raise ValueError(
                    f"synonym canonicals {chained} are also synonym keys: "
                    "chains are not applied recursively — map every "
                    "surface directly to its final canonical")
            if self.stem:
                unstable = sorted(v for v in set(syn.values())
                                  if stem_py(v) != v)
                if unstable:
                    raise ValueError(
                        f"synonym canonicals {unstable} are not "
                        "stem-fixed under stem=True — use the stemmed "
                        "form as the canonical")
            stopped = sorted(set(syn.values()) & set(self.stopwords))
            if stopped:
                raise ValueError(
                    f"synonym canonicals {stopped} are in the stop list")


# clamp on the effective merge fan-out: one bucket per this many run rows
# (~5 posting-seconds of kernel work per cell at measured rates) — below it
# extra cells are pure scheduling overhead
_RUNS_PER_MERGE_BUCKET = 50_000


# what the runs stage writes per salt dir: salt travels in the hive
# directory name, not the data files (they would collide at partition
# discovery); also the explicit read schema for empty salt dirs (a salt with
# no postings writes zero data files, which schema inference cannot read)
RUNS_FILE_SCHEMA = (
    "termID long, shard int, n int, first_docID long, "
    "last_docID long, nbytes int, build_pid int, blob binary"
)
# map-side partial posting runs (the "mruns" stage): keyed by TERM STRING —
# termIDs do not exist yet when the map side runs; the runs stage joins the
# dictionary over run rows (vocabulary-bounded per partition), never over
# exploded postings
MRUNS_SCHEMA = (
    "term string, shard int, salt int, n int, first_docID long, "
    "last_docID long, nbytes int, build_pid int, blob binary"
)
# max_tf/min_dl: idf- and avgdl-free block statistics. max_impact bakes the
# build-time idf and avgdl into the pruning bound; after an incremental append
# both drift, so query-time can rebuild a SAFE upper bound from (max_tf,
# min_dl) under the CURRENT stats: impact <= idf_now * tf_part(max_tf,
# min_dl, avgdl_now) for every posting in the block (tf_part is increasing in
# tf and decreasing in dl). See append.py.
POSTINGS_SCHEMA = (
    "termID long, shard int, block_id int, n int, first_docID long, "
    "last_docID long, max_impact double, max_tf int, min_dl int, blob binary"
)  # blob last: kernels emit batches in schema order, chunked on blob bytes


def index_format_tag(config: IndexConfig) -> str:
    """Content hash identifying the on-disk index format + build semantics.

    Derived from everything that changes what a built index MEANS — the
    postings/runs schemas, every IndexConfig field, the codec blob format
    version, the BM25 constants, and the tokenizer split — so any cache keyed
    on this tag (suite.py's resumable suite index) invalidates automatically
    when the format changes. Replaces the hand-bumped version literal a
    forgotten bump would silently defeat."""
    import hashlib

    payload = "|".join(
        [
            POSTINGS_SCHEMA,
            RUNS_FILE_SCHEMA,
            MRUNS_SCHEMA,
            repr(sorted(asdict(config).items())),
            f"codec={codec.FORMAT_VERSION}",
            f"k1={scoring.K1}",
            f"b={scoring.B}",
            TOKEN_SPLIT_RE,
        ]
    )
    return hashlib.md5(payload.encode()).hexdigest()[:10]


def _stage(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job, no data read."""
    import pyarrow.dataset as ds

    return ds.dataset(path, format="parquet", partitioning="hive").count_rows()


def _partition_metrics(df: DataFrame, rows_col: str = "n", bytes_col: str = "nbytes"):
    """Per-partition (run-level) row/byte metrics for the manifest."""
    agg = (
        df.groupBy("build_pid")
        .agg(
            F.count("*").alias("runs"),
            F.sum(rows_col).alias("rows"),
            F.sum(bytes_col).alias("bytes"),
        )
        .collect()
    )
    return {
        str(r["build_pid"]): {"runs": r["runs"], "rows": int(r["rows"]), "bytes": int(r["bytes"])}
        for r in agg
    }


def _binary_from_offsets(data: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Zero-copy Arrow binary column from one data buffer + slice offsets —
    no per-row Python bytes objects. Caller guarantees the slice fits int32
    offsets (see _chunk_rows)."""
    assert offsets[-1] < (1 << 31), "blob batch exceeds int32 offsets; chunk first"
    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(data)],
    )


def _chunk_rows(offs: np.ndarray, max_bytes: int) -> list[tuple[int, int]]:
    """Row ranges [(r0, r1), ...] such that each range's blob bytes stay
    under the int32-offset ceiling (Arrow plain binary = 2 GiB per batch).
    One range in the common case; mapInArrow streams multiple batches, so
    downstream never sees the difference."""
    n = len(offs) - 1
    if n <= 0:
        return [(0, n)] if n == 0 else []
    ranges = []
    r0 = 0
    while r0 < n:
        # furthest row whose cumulative bytes from r0 stay under the cap
        r1 = int(np.searchsorted(offs, offs[r0] + max_bytes, side="right")) - 1
        r1 = max(r1, r0 + 1)  # always progress (a single >cap row still ships)
        ranges.append((r0, min(r1, n)))
        r0 = min(r1, n)
    return ranges


def _blob_batches(columns: dict, data: np.ndarray, offs: np.ndarray,
                  max_bytes: int):
    """Yield RecordBatches over row chunks: ``columns`` maps name -> full
    numpy/pa array; the blob column is rebuilt per chunk with rebased
    offsets (zero-copy slices of the one data buffer)."""
    names = [*columns.keys(), "blob"]
    for r0, r1 in _chunk_rows(offs, max_bytes):
        rebased = offs[r0: r1 + 1] - offs[r0]
        blob = _binary_from_offsets(data[offs[r0]: offs[r1]], rebased)
        yield pa.RecordBatch.from_arrays(
            [pa.array(v[r0:r1]) if isinstance(v, np.ndarray) else v.slice(r0, r1 - r0)
             for v in columns.values()] + [blob],
            names=names,
        )



def _map_runs_arrow_factory(max_batch_bytes: int, chunk_rows: int = 1 << 22,
                            stopwords: tuple = (), stem: bool = False,
                            synonyms: tuple = ()):
    """mapInArrow kernel over docs partitions: tokenize-explode in memory and
    emit per-partition partial posting runs — sorted (term, docID, tf, doclen)
    groups per (term, shard, salt), delta+varbyte-encoded with the same codec
    as the final index.

    This is the map-side half of the north rule's "per-partition posting
    lists as sorted runs, merged via salted repartition-and-merge": the
    exploded (docID, term, tf) rows never leave the map task. What crosses
    the wire downstream is one compressed run row per distinct (term, shard,
    salt) of the partition — vocabulary-bounded, ~10-30x fewer rows and
    ~5-10x fewer bytes than the exploded form at transcript shapes — which is
    what makes the build's shuffle survive a 100x corpus scale-up.

    Memory is bounded by ``chunk_rows``: exploded rows accumulate until the
    cap, then flush as runs for that docID slice. A (term, shard, salt) group
    split across flushes yields several runs — the combine stage merges
    arbitrary run multiplicity per group, so chunking is invisible downstream
    (tests force multi-chunk flushes and assert byte-identical indexes).
    """

    def maprun(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        from .session import disable_thp
        from .tokenize import make_tf_explode_kernel

        disable_thp()
        tf_explode = make_tf_explode_kernel(stopwords, stem, synonyms)
        state: dict = {}

        def tap(bs):
            for b in bs:
                if "pid" not in state and b.num_rows:
                    state["pid"] = int(b.column("build_pid")[0].as_py())
                yield b

        def flush(pending: list) -> Iterator[pa.RecordBatch]:
            tbl = pa.Table.from_batches(pending)
            if tbl.num_rows == 0:
                return
            # one unified dictionary per flush: group postings by term code
            term = tbl.column("term").combine_chunks()
            dct = pc.dictionary_encode(term)
            codes = dct.indices.to_numpy().astype(np.int64)
            doc = tbl.column("docID").to_numpy()
            tf = tbl.column("tf").to_numpy()
            dl = tbl.column("doclen").to_numpy()
            shard = tbl.column("shard").to_numpy()
            salt = tbl.column("salt").to_numpy()
            order = np.lexsort((doc, salt, shard, codes))
            codes, doc = codes[order], doc[order]
            tf, dl = tf[order], dl[order]
            shard, salt = shard[order], salt[order]
            change = (
                (np.diff(codes) != 0) | (np.diff(shard) != 0) | (np.diff(salt) != 0)
            )
            starts = np.concatenate([[0], np.flatnonzero(change) + 1])
            ends = np.concatenate([starts[1:], [len(codes)]])
            data, offs = codec.encode_runs_grouped(doc, tf, dl, starts, ends)
            yield from _blob_batches(
                {
                    "term": dct.dictionary.take(
                        pa.array(codes[starts], type=pa.int32())
                    ),
                    "shard": shard[starts].astype(np.int32),
                    "salt": salt[starts].astype(np.int32),
                    "n": (ends - starts).astype(np.int32),
                    "first_docID": doc[starts].astype(np.int64, copy=False),
                    "last_docID": doc[ends - 1].astype(np.int64, copy=False),
                    "nbytes": np.diff(offs).astype(np.int32),
                    "build_pid": np.full(
                        starts.size, state.get("pid", 0), dtype=np.int32
                    ),
                },
                data, offs, max_batch_bytes,
            )

        pending: list[pa.RecordBatch] = []
        pending_rows = 0
        for eb in tf_explode(tap(batches)):
            pending.append(eb)
            pending_rows += eb.num_rows
            if pending_rows >= chunk_rows:
                yield from flush(pending)
                pending, pending_rows = [], 0
        if pending:
            yield from flush(pending)

    return maprun


def _merge_runs_arrow_factory(block_size: int, avgdl: float, max_batch_bytes: int = 1 << 30):
    """mapInArrow kernel: partition rows sorted by (termID, shard, salt) ->
    per (termID, shard) group, merge its S salted runs into final docID-sorted
    blocks with block-max impact metadata.

    Group-boundary detection is numpy over the whole Arrow partition; the
    per-group work is a handful of codec calls — orders of magnitude cheaper
    than a per-group pandas DataFrame (applyInPandas) when groups number in
    the hundreds of thousands.
    """

    def merge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
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
        nrun = tbl.column("n").to_numpy()
        idf = tbl.column("idf").to_numpy()
        # zero-copy per chunk: each chunk's binary data buffer IS its blob
        # concatenation — no per-row Python bytes objects, no join copy.
        # Chunks are concatenated with one bounded memcpy instead of
        # combine_chunks (whose int32 offsets overflow past 2 GiB total).
        parts = []
        for ch in tbl.column("blob").chunks:
            boffs = np.frombuffer(ch.buffers()[1], dtype=np.int32)
            lo = int(boffs[ch.offset])
            hi = int(boffs[ch.offset + len(ch)])
            parts.append(np.frombuffer(ch.buffers()[2], dtype=np.uint8)[lo:hi])
        blob_buf = parts[0] if len(parts) == 1 else np.concatenate(parts)
        # run -> (termID, shard) group ids over the sort prefix
        change = (np.diff(term) != 0) | (np.diff(shard) != 0)
        run_group = np.zeros(len(term), dtype=np.int64)
        run_group[1:] = np.cumsum(change)
        # decode every salted run of the partition in one pass, then re-sort
        # postings by (group, docID) — the salted-merge undo (docIDs unique)
        doc, tf, dl, rs = codec.decode_runs_concat(blob_buf, nrun)
        post_group = np.repeat(run_group, nrun)
        post_idf = np.repeat(idf, nrun)
        post_term = np.repeat(term, nrun)
        post_shard = np.repeat(shard, nrun)
        # fast path: map-side runs from docID-contiguous partitions arrive
        # (given the first_docID sort) range-disjoint and ascending within
        # each group, so the concat IS already (group, docID)-sorted — check
        # the run boundaries (O(runs)) and skip the O(postings log) lexsort.
        # Appends / arbitrary salted inputs fail the check and take the sort;
        # both paths produce identical bytes (the lexsort is exactly the
        # order the check certifies).
        sorted_already = bool(
            np.all(
                (run_group[1:] != run_group[:-1])
                | (doc[rs[1:-1]] > doc[rs[1:-1] - 1])
            )
        ) if len(term) > 1 else True
        if not sorted_already:
            order = np.lexsort((doc, post_group))
            doc, tf, dl = doc[order], tf[order], dl[order]
            post_group, post_idf = post_group[order], post_idf[order]
            post_term, post_shard = post_term[order], post_shard[order]
        gchange = np.diff(post_group) != 0
        gstarts = np.concatenate([[0], np.flatnonzero(gchange) + 1])
        gends = np.concatenate([gstarts[1:], [doc.size]])
        bsz = codec.adaptive_block_sizes(gends - gstarts, block_size)
        bstarts, bends, block_ids, _ = codec.block_bounds(gstarts, gends, bsz)
        data, offs = codec.encode_runs_grouped(doc, tf, dl, bstarts, bends)
        impacts = post_idf * scoring.tf_part_np(tf, dl, avgdl)
        yield from _blob_batches(
            {
                "termID": post_term[bstarts].astype(np.int64, copy=False),
                "shard": post_shard[bstarts].astype(np.int32),
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

    return merge


def build_index(
    spark: SparkSession,
    transcripts: DataFrame | str,
    index_dir: str,
    config: IndexConfig = IndexConfig(),
    resume: bool = True,
    run_id: str = "run0",
    id_cols: list[str] | None = None,
    text_col: str = "text",
) -> dict:
    """Build (or resume building) the full index under ``index_dir``.

    ``id_cols`` is the corpus's unique document key (default transcript key
    ``(conv_id, turn_idx)``); docID is the deterministic global rank over it.
    Returns the final meta dict (also persisted as ``meta.json``).
    """
    id_cols = id_cols or ["conv_id", "turn_idx"]
    # refuse to build OVER an index that carries appended batches: the
    # root-meta rewrite at the end of this function would reset the merged
    # (n_docs, avgdl, dictionary) statistics to base-build values while the
    # appended docs/postings hive partitions linger on disk (dynamic
    # partition overwrite never touches them) — a silently corrupted index.
    # Re-running the ORIGINAL base build to resume a crash is fine (no
    # appends published yet); anything later goes through append/compact/
    # reindex, or a fresh directory.
    existing = read_manifest(index_dir)
    if existing and existing.get("appends"):
        raise RuntimeError(
            f"index at {index_dir} carries appended batches "
            f"{existing['appends']}: build_index over it would reset the "
            "merged statistics and leave stale append partitions — use "
            "build.reindex into a fresh directory, keep appending, or "
            "delete the index first"
        )
    stage_secs: dict[str, float] = {}
    _t = time.time()

    def _mark(stage: str) -> None:
        nonlocal _t
        stage_secs[stage] = round(time.time() - _t, 2)
        _t = time.time()

    def _desc(stage: str | None) -> None:
        # label the upcoming stage's Spark jobs in the UI / REST API —
        # observability only (scripts/cost_model.py aggregates per-stage
        # shuffle/input bytes by this description; on a real cluster it is
        # what an operator sees in the event timeline)
        spark.sparkContext.setJobDescription(
            None if stage is None else f"eh-build:{stage}"
        )
    if isinstance(transcripts, str):
        lineage_input = transcripts
        transcripts = spark.read.parquet(transcripts)
    else:
        lineage_input = "<in-memory DataFrame>"
    os.makedirs(index_dir, exist_ok=True)
    conf = asdict(config)
    base_expect = {
        "config": conf, "input": lineage_input,
        "id_cols": id_cols, "text_col": text_col,
    }

    # vacuumed resume short-circuit: the run stages are gone by explicit
    # request, so "resume" of the SAME finished build must return its meta
    # instead of falling through to a pointless mruns/runs rebuild. The
    # surviving stage manifests still prove config+lineage identity; any
    # mismatch falls through to the normal path, which rebuilds every
    # stage from scratch (correct for a genuinely different config).
    if resume and existing and existing.get("vacuumed") and all(
        stage_complete(_stage(index_dir, s), base_expect)
        for s in ("docs", "terms", "postings")
    ):
        return existing

    # ---- stage 1: docs — docID + shard + doclen (also the forward table:
    # metadata travels unindexed, like the reference's index:false stored
    # fields, import_csv.py:114-115; parquet column pruning makes it free).
    # doclen comes from the JVM tokenizer twin (tokens_expr) — same pinned
    # semantics as the Arrow path, zero Python.
    docs_dir = _stage(index_dir, "docs")
    _desc("docs")
    if not (resume and stage_complete(docs_dir, base_expect)):
        # lazy ordinal: the parquet write below is the single materialization
        # (no localCheckpoint pass, no separate count job — the ordinal's own
        # per-partition count supplies n_docs)
        if config.doc_order == "doclen":
            # impact-aware assignment: docID rank = (doclen, key). doclen is
            # computed once here (JVM tokenizer twin) and persists through the
            # ordinal's range partitioning, so the sort costs no extra pass.
            src = transcripts.withColumn(
                "doclen",
                F.size(tokens_expr(F.col(text_col), config.stopwords,
                                   config.stem, config.synonyms)),
            )
            order_cols: list = ["doclen", *id_cols]
        elif config.doc_order == "key":
            src = transcripts
            order_cols = list(id_cols)
        else:
            raise ValueError(f"unknown doc_order {config.doc_order!r}")
        docs, n_docs, finish = with_ordinal_lazy(src, order_cols, "docID")
        try:
            shard_size = max(1, math.ceil(n_docs / config.num_shards))
            if config.doc_order == "doclen":
                # modulo sharding: under impact ordering a docID RANGE shard
                # would be a doclen band, making every shard's local top-k
                # threshold track its local block maxima — zero pruning.
                # Interleaving keeps each shard a full cross-section of the
                # impact spectrum (short docs everywhere), so shard-local
                # thresholds approximate the global one and block-max decay
                # survives within every shard (docID ascending ⇒ doclen
                # ascending holds in each residue class).
                shard_col = (F.col("docID") % F.lit(config.num_shards)).cast("int")
            else:
                shard_col = (F.col("docID") / F.lit(shard_size)).cast("int")
            docs = docs.withColumn("shard", shard_col)
            if config.doc_order != "doclen":
                docs = docs.withColumn(
                    "doclen",
                    F.size(tokens_expr(F.col(text_col), config.stopwords,
                                       config.stem, config.synonyms)),
                )
            # hive-partitioned by batch so incremental appends land in their
            # own partitions with dynamic overwrite (rerun-idempotent) —
            # see append.py
            docs.withColumn("batch", F.lit("base")).write.mode(
                "overwrite"
            ).partitionBy("batch").parquet(docs_dir)
        finally:
            finish()
        # ordinal-integrity check (cheap parquet-footer count): on a real
        # cluster, loss of the persisted range partitions would recompute
        # repartitionByRange with fresh samples and silently duplicate/skip
        # docIDs relative to the already-collected offsets — fail the stage
        # instead of indexing a corrupt id space
        written = _parquet_rows(docs_dir)
        if written != n_docs:
            raise RuntimeError(
                f"docs stage wrote {written} rows but the ordinal pass "
                f"counted {n_docs}; range partitions were recomputed "
                "mid-write — rerun the stage"
            )
        write_manifest(
            docs_dir,
            {**base_expect, "stage": "docs", "run_id": run_id,
             "rows": n_docs, "shard_size": shard_size},
        )
    _mark("docs")
    docs_meta = read_manifest(docs_dir)
    n_docs, shard_size = docs_meta["rows"], docs_meta["shard_size"]
    docs = spark.read.parquet(docs_dir)

    # ---- stage 2: mruns — map-side partial posting runs. Tokenize-explode
    # stays INSIDE the map task (one Arrow kernel: explode -> sort -> encode);
    # what is written/shuffled is one delta+varbyte run row per distinct
    # (term, shard, salt = docID % S) of each docs partition. Hive-partitioned
    # by salt so the per-salt runs jobs read only their bucket.
    mruns_dir = _stage(index_dir, "mruns")
    _desc("mruns")
    if not (resume and stage_complete(mruns_dir, base_expect)):
        mruns = (
            docs.select(
                "docID",
                F.col(text_col).alias("text"),
                "shard",
                (F.col("docID") % F.lit(config.salt_buckets)).cast("int").alias("salt"),
                F.spark_partition_id().alias("build_pid"),
            )
            .mapInArrow(
                _map_runs_arrow_factory(
                    config.batch_blob_bytes, config.map_chunk_rows,
                    config.stopwords, config.stem, config.synonyms,
                ),
                MRUNS_SCHEMA,
            )
        )
        mruns.write.mode("overwrite").partitionBy("salt").parquet(mruns_dir)
        n_runs = _parquet_rows(mruns_dir)
        write_manifest(
            mruns_dir,
            {**base_expect, "stage": "mruns", "run_id": run_id,
             "rows": n_runs},
        )
    _mark("mruns")

    # ---- stage 3: terms — df per term, deterministic termID, idf; avgdl from
    # total token count / N (doclen-0 docs count in N, add 0 to the sum)
    # (the DataFrame-aggregate analogue of ES cluster stats, dh/app/util.py:242-244)
    terms_dir = _stage(index_dir, "terms")
    _desc("terms")
    if not (resume and stage_complete(terms_dir, base_expect)):
        mruns_all = spark.read.parquet(mruns_dir)
        # total tokens from the docs table's doclen column, not a full scan
        # of the (≈avgdl× larger) exploded tf table: Σ doclen over docs equals
        # Σ tf over tf by construction (both come from the same pinned
        # tokenizer; index_stats already computes avgdl this way, so build
        # and stats agree by construction too)
        total_tokens = docs.agg(
            F.sum(F.col("doclen").cast("long"))
        ).collect()[0][0] or 0
        avgdl = float(total_tokens) / n_docs if n_docs else 0.0
        # df = Σ run lengths per term: every posting in a run is a distinct
        # doc, and a doc hits exactly one (shard, salt, partition-chunk) run
        # per term — a column-pruned scan of (term, n), never of postings
        dfreq = mruns_all.groupBy("term").agg(
            F.sum(F.col("n").cast("long")).alias("df")
        )
        tdict = with_ordinal(dfreq, [("df", "desc"), "term"], "termID")
        tdict = tdict.withColumn(
            "idf", scoring.idf_col(n_docs, F.col("df").cast("double"))
        )
        tdict.write.mode("overwrite").parquet(terms_dir)
        write_manifest(
            terms_dir,
            {**base_expect, "stage": "terms", "run_id": run_id,
             "rows": _parquet_rows(terms_dir), "avgdl": avgdl, "n_docs": n_docs},
        )
    _mark("terms")
    terms_meta = read_manifest(terms_dir)
    avgdl, n_terms = terms_meta["avgdl"], terms_meta["rows"]
    tdict = spark.read.parquet(terms_dir)

    # ---- stage 4: runs — one resumable sub-stage per salt bucket
    # (per-partition checkpoints: a killed build resumes at bucket granularity).
    # The buckets are independent jobs over disjoint inputs/outputs, so they
    # are submitted concurrently — Spark's scheduler interleaves their tasks,
    # hiding per-job setup latency (each job alone under-utilizes the cluster
    # during its scheduling and write tails).
    #
    # The bucket's work is the term -> termID dictionary join over run rows
    # (vocabulary-bounded; AQE broadcasts while the dict is small, sort-merge
    # at billion-term scale) plus a repartition by (termID, shard) that lands
    # each group's runs contiguously for the postings merge. No posting is
    # decoded here: the merge kernel accepts ARBITRARY run multiplicity per
    # (termID, shard) — the map-side partial runs flow through compressed,
    # and the one decode-sort-encode pass of the whole build happens in the
    # postings stage.
    runs_root = _stage(index_dir, "runs")
    n_parts = config.run_partitions or max(
        2, (spark.sparkContext.defaultParallelism * 4) // config.salt_buckets
    )

    def _build_salt_bucket(s: int) -> None:
        # job descriptions are thread-local in the JVM — set explicitly on
        # each pool thread (inheritance across Python threads is mode-
        # dependent)
        _desc("runs")
        salt_dir = os.path.join(runs_root, f"salt={s}")
        expect = {**base_expect, "salt": s}
        if resume and stage_complete(salt_dir, expect):
            return
        runs = (
            spark.read.parquet(mruns_dir)
            .where(F.col("salt") == s)
            .join(tdict.select("term", "termID"), "term")
            .repartition(n_parts, "termID", "shard")
            .select(
                "termID", "shard", "n", "first_docID", "last_docID",
                "nbytes", "build_pid", "blob",
            )
        )
        # the hive dir name (salt=s) carries the salt value; keeping it in the
        # data files too would collide at partition-discovery time
        runs.write.mode("overwrite").parquet(salt_dir)
        # explicit schema: a salt bucket with no runs (fewer docs partitions
        # than salt values) writes zero data files, unreadable by inference
        written = spark.read.schema(RUNS_FILE_SCHEMA).parquet(salt_dir)
        write_manifest(
            salt_dir,
            {**expect, "stage": f"runs/salt={s}", "run_id": run_id,
             "partitions": _partition_metrics(written)},
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=config.salt_buckets) as pool:
        list(pool.map(_build_salt_bucket, range(config.salt_buckets)))

    _mark("runs")

    # ---- stage 5: postings — merge salted runs, final blocks + block-max
    postings_dir = _stage(index_dir, "postings")
    _desc("postings")
    if not (resume and stage_complete(postings_dir, base_expect)):
        # column-pruned: the merge kernel needs neither last_docID nor nbytes
        # (metadata for resume diagnostics) — dropping them cuts the Arrow
        # transfer into the Python workers; first_docID rides along only as
        # the sort key that lines groups up for the kernel's skip-sort fast
        # path, then is dropped before the transfer
        runs = spark.read.parquet(runs_root).select(
            "termID", "shard", "salt", "n", "first_docID", "blob"
        )
        # merge fan-out (see IndexConfig.merge_buckets): shuffle on (shard,
        # merge_bucket) where buckets are df-mass-balanced contiguous termID
        # ranges, so merge parallelism is shards x buckets instead of
        # capping at the shard count. The effective fan-out clamps by run
        # volume — a test-sized build gets 1 bucket and exactly the old
        # single-key plan. Every (termID, shard) group still lands whole in
        # one partition (bucket is a function of termID), so the kernel and
        # the postings CONTENT are untouched (asserted by the
        # any-merge_buckets fingerprint-identity test).
        n_runs_total = int(read_manifest(mruns_dir).get("rows") or 0)
        t_eff = max(
            1, min(config.merge_buckets, n_runs_total // _RUNS_PER_MERGE_BUCKET)
        )
        # equi-join on termID; Catalyst/AQE picks broadcast while the dict is
        # small and falls back to sort-merge at billion-term scale
        tsel = tdict.select("termID", "idf", "df")
        if t_eff > 1:
            cum, total_df = with_running_total(tsel, ["termID"], "df", "_cum")
            tsel = cum.withColumn(
                "merge_bucket",
                F.least(
                    F.lit(t_eff - 1),
                    F.floor(
                        (F.col("_cum") - F.col("df")) * t_eff
                        / F.lit(max(total_df, 1))
                    ),
                ).cast("int"),
            )
        else:
            tsel = tsel.withColumn("merge_bucket", F.lit(0))
        runs = runs.join(
            tsel.select("termID", "idf", "merge_bucket"), "termID"
        )
        # 2x wider than the cell count: hashing exactly C distinct values
        # into C buckets collides (~1/e empty, survivors carrying 2-3 cells
        # = stragglers); doubling the width leaves most busy partitions one
        # cell while keeping task-commit counts (and output file counts)
        # bounded — each busy partition writes one file per shard it holds
        merged = (
            runs.repartition(
                2 * config.num_shards * max(2, t_eff), "shard", "merge_bucket"
            )
            .sortWithinPartitions("termID", "shard", "first_docID")
            .drop("first_docID", "merge_bucket")
            .mapInArrow(
                _merge_runs_arrow_factory(config.block_size, avgdl,
                                          config.batch_blob_bytes),
                POSTINGS_SCHEMA,
            )
        )
        # layout for query-time pruning: hive-partitioned by shard; the kernel
        # emits rows already sorted by (termID, block_id), so parquet row-group
        # min/max stats prune non-query terms on read
        merged.write.mode("overwrite").partitionBy("shard").parquet(postings_dir)
        written = spark.read.parquet(postings_dir)
        stats = written.agg(
            F.count("*").alias("blocks"),
            F.sum("n").alias("postings"),
            F.sum(F.length("blob")).alias("bytes"),
        ).collect()[0]
        write_manifest(
            postings_dir,
            {**base_expect, "stage": "postings", "run_id": run_id,
             "blocks": stats["blocks"], "postings": int(stats["postings"]),
             "bytes": int(stats["bytes"])},
        )

    _mark("postings")
    _desc(None)
    meta = {
        "run_id": run_id,
        "stage_secs": stage_secs,
        "input": lineage_input,
        "config": conf,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": n_terms,
        "shard_size": shard_size,
        "tokenizer_split": TOKEN_SPLIT_RE,
        "bm25": {"k1": scoring.K1, "b": scoring.B,
                 "idf": "ln((N-df+0.5)/(df+0.5)+1)"},
    }
    write_manifest(index_dir, {**meta, "stage": "meta"})
    return meta


def vacuum_build_intermediates(index_dir: str) -> dict:
    """Drop a FINISHED build's intermediate stages (``mruns``, ``runs``).

    Every read path of a published index is served by docs/terms/postings
    (plus ``deletes``): queries and aggregations read those three; append
    stages under ``appends/<run_id>``; compaction/refresh publish into
    ``compact_*``/``refresh_*`` and swap; reindex rebuilds from the forward
    store; snapshots exclude intermediates by design; pin views link only
    the queryable stages. The run stages exist solely to resume an
    UNFINISHED build — on the measured bill of materials (BENCH.md) they
    are ~55% of the on-disk footprint, so at 10^12 turns vacuuming halves
    index storage. The ES analogue is dropping the indexing buffer and
    translog once a commit publishes the segments.

    Refuses while the build is unfinished (no root manifest — the next
    ``build_index(resume=True)`` still needs the runs). Idempotent. The
    removed stages' manifests (row/byte lineage metrics) are preserved
    verbatim under the root manifest's ``vacuumed`` marker, and
    ``build_index(resume=True)`` short-circuits on that marker instead of
    rebuilding the missing stages."""
    meta = read_manifest(index_dir)
    if not meta:
        raise ValueError(
            f"{index_dir} has no root {MANIFEST_NAME}: the build is "
            "unfinished (or not an index) — resume it to completion first; "
            "its run stages are exactly what the resume needs")
    freed = 0
    removed: list[str] = []
    manifests: dict[str, dict] = {}  # relpath -> its stage manifest
    for stage in ("mruns", "runs"):
        sdir = _stage(index_dir, stage)
        if not os.path.isdir(sdir):
            continue
        removed.append(stage)
        for dirpath, _dirs, names in os.walk(sdir):
            # the runs stage keeps one manifest PER salt bucket — preserve
            # every nested manifest, keyed by its index-relative path
            if MANIFEST_NAME in names:
                rel = os.path.relpath(dirpath, index_dir)
                manifests[rel] = read_manifest(dirpath) or {}
            for n in names:
                try:
                    freed += os.path.getsize(os.path.join(dirpath, n))
                except OSError:
                    pass
        shutil.rmtree(sdir)
    if removed:  # idempotent: a second vacuum changes nothing
        prior = meta.get("vacuumed") or {"bytes_freed": 0, "stage_manifests": {}}
        meta["vacuumed"] = {
            "at_unix": time.time(),
            "bytes_freed": int(prior["bytes_freed"]) + freed,
            "stage_manifests": {**prior["stage_manifests"], **manifests},
        }
        write_manifest(index_dir, meta)  # atomic tmp+rename publish
    return {"bytes_freed": freed, "stages_removed": sorted(removed),
            "index_dir": index_dir}


def load_index(spark: SparkSession, index_dir: str):
    """(meta, docs_df, terms_df, postings_df) — column-pruned lazy readers."""
    meta = read_manifest(index_dir)
    docs = spark.read.parquet(_stage(index_dir, "docs")).drop("pairs")
    terms = spark.read.parquet(_stage(index_dir, "terms"))
    postings = spark.read.parquet(_stage(index_dir, "postings"))
    return meta, docs, terms, postings


def reindex(
    spark: SparkSession,
    src_index_dir: str,
    dst_index_dir: str,
    config: IndexConfig = IndexConfig(),
    resume: bool = False,
    run_id: str = "reindex0",
) -> dict:
    """ES ``_reindex``: rebuild an index under a NEW configuration (shard
    count, block size, doc order, salting) from its own stored docs table —
    the original corpus is not needed, because the docs stage is also the
    forward store (text + id columns travel with it, the reference's
    ``index:false`` stored-fields pattern, import_csv.py:114-115).

    Query results are configuration-independent: the rebuilt index returns
    rank-identical top-k for every query (asserted in tests; the suite
    oracle gate also certifies a reindexed index against the same SQL).
    Used for shard rebalancing after heavy appends, changing
    ``doc_order`` to recover pruning economics, or codec upgrades.

    Scale shape: identical to ``build_index`` (it IS build_index over the
    docs parquet — one corpus-sized read, the same salted run/merge
    pipeline, resumable into ``dst_index_dir``).
    """
    if os.path.abspath(src_index_dir) == os.path.abspath(dst_index_dir):
        raise ValueError("reindex requires dst_index_dir != src_index_dir "
                         "(the source stays readable throughout)")
    # id_cols/text_col live on the docs-stage manifest (the top-level meta
    # carries corpus statistics)
    meta = read_manifest(_stage(src_index_dir, "docs"))
    if not meta or "id_cols" not in meta:
        raise ValueError(f"no index docs manifest at {src_index_dir}")
    id_cols = list(meta["id_cols"])
    docs = spark.read.parquet(_stage(src_index_dir, "docs")) \
        .select(*id_cols, "text")
    return build_index(
        spark, docs, dst_index_dir, config,
        resume=resume, run_id=run_id, id_cols=id_cols, text_col="text",
    )


def index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """ES ``_stats``/``_count`` index-level statistics, computed from the
    PHYSICAL tables (not echoed from the manifest — the point is an
    end-to-end consistency check of what is actually on disk): corpus size,
    vocabulary size, total postings (= distinct (term, doc) pairs by
    construction), block count, and the 6dp-rounded avgdl. One row; each
    aggregate is a column-pruned scan of its stage table.

    ``n_deleted`` is the tombstone-set size (ES ``docs.deleted``): those
    docs still count in n_docs/avgdl/df until :func:`~.deletes
    .expunge_deletes` merges them out — the Lucene live-docs accounting.

    Reference analogue: the cluster-stats probe the app consults before
    querying (``/root/reference/dh/app/util.py:242-244``)."""
    from .deletes import load_tombstones

    _meta, docs, terms, postings = load_index(spark, index_dir)
    n_docs = docs.count()
    dl_sum = docs.agg(F.sum(F.col("doclen").cast("long"))).collect()[0][0] or 0
    n_terms = terms.count()
    agg = postings.agg(
        F.sum(F.col("n").cast("long")).alias("p"),
        F.count(F.lit(1)).alias("b"),
    ).collect()[0]
    tomb = load_tombstones(spark, index_dir)
    n_deleted = 0 if tomb is None else tomb.distinct().count()
    avgdl = float(dl_sum) / n_docs if n_docs else 0.0
    return spark.createDataFrame(
        [(n_docs, n_terms, int(agg["p"] or 0), int(agg["b"]),
          int(n_deleted), round(avgdl, 6))],
        "n_docs long, n_terms long, n_postings long, n_blocks long, "
        "n_deleted long, avgdl_r double",
    )
