"""Two-stage query engine: block-max WAND prefilter + exact BM25 rescore.

Structural transposition of the reference's two-stage retrieval
(``/root/reference/dh/app/templates/es_query.7.x.json``):

- **Stage 1 (coarse, recall-guaranteed)** — ElasticHash filters candidates via
  a ``terms`` lookup into the precomputed ``nbs`` neighbors index (64-bit
  multi-index-hashing prefilter; ``es_query.7.x.json:56-103``). Here the
  precomputed pruning structure is the per-block **max BM25 impact** written
  at build time: WAND/BMW skips every docID region whose upper-bound score
  (sum of term/block max impacts) cannot reach the current top-k threshold.
  Like the MIH pigeonhole guarantee (slides p.7-8), pruning is *safe*: block
  max >= any member impact, so no true top-k doc is ever discarded — but
  unlike the reference's filter (which loses ~0.1-2.5 mAP), it is lossless.
- **Stage 2 (exact rerank)** — ElasticHash rescores survivors with the exact
  256-bit Hamming script ``hd64`` (``dh/tools/add_hdist.py:18-22``). Here
  survivors are scored with exact float64 BM25 from the decoded (tf, doclen)
  postings, accumulated in ascending termID order — bit-compatible with the
  brute-force oracle.
- **Top-k merge** — per-shard heaps then a global merge, exactly ES's
  per-shard top-k + coordinator merge (3-shard setup, ``import_csv.py:31``),
  expressed as per-partition kernels + a global window under the pinned total
  order (score DESC, docID ASC).

Query distribution: the query set is tiny relative to the corpus (the
reference sweeps 10k queries over 7M docs), so queries are collected and
broadcast into the posting-scan kernel; postings are read with a pushed-down
``termID IN (...)`` filter so only the query terms' blocks leave the parquet
scan, then shuffled once by shard so each doc's full term set is co-located
(a doc's exact score must be assembled in one task).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import codec, scoring
from .build import load_index
from .tokenize import tokenize_py

RESULT_SCHEMA = "qid long, docID long, score double"
_INF = np.iinfo(np.int64).max


def _topk_vec(scores: np.ndarray, docids: np.ndarray, k: int) -> list[tuple[float, int]]:
    """Vectorized top-k under the pinned total order (score DESC, docID ASC),
    dropping score-0 docs."""
    sel = scores > 0.0
    scores, docids = scores[sel], docids[sel]
    if scores.size == 0:
        return []
    if scores.size > k:
        # O(n) pre-cut; keep every doc tied with the k-th score (the docID
        # tie-break may need them)
        kth = -np.partition(-scores, k - 1)[k - 1]
        keep = np.flatnonzero(scores >= kth)
        scores, docids = scores[keep], docids[keep]
    order = np.lexsort((docids, -scores))[:k]
    return [(float(scores[i]), int(docids[i])) for i in order]


class _BlockTerm:
    """One query term's block metadata + lazy decode cache within a shard."""

    __slots__ = ("term_id", "idf", "first", "last", "n", "bmax", "blobs", "ub", "_cache")

    def __init__(self, term_id, idf, first, last, n, bmax, blobs, cache=None):
        self.term_id = term_id
        self.idf = idf
        self.first = first
        self.last = last
        self.n = n
        self.bmax = bmax
        self.blobs = blobs
        self.ub = float(bmax.max())
        # cache is shared per shard: queries with overlapping terms reuse decodes
        self._cache = cache if cache is not None else {}

    def decode(self, bi: int):
        key = (self.term_id, bi)
        got = self._cache.get(key)
        if got is None:
            got = codec.decode_run(self.blobs[bi], int(self.n[bi]))
            self._cache[key] = got
        return got

    def decode_full(self, avgdl: float):
        """All of this term's shard postings in one vectorized decode, plus
        the per-posting BM25 contributions — computed ONCE per (shard, term)
        and reused by every query in the batch (the decisive amortization:
        decode cost is paid once, per-query work is numpy gather/add)."""
        key = (self.term_id, -1)
        got = self._cache.get(key)
        if got is None:
            doc, tf, dl, run_starts = codec.decode_runs_concat(self.blobs, self.n)
            contr = self.idf * scoring.tf_part_np(tf, dl, avgdl)
            got = (doc, contr, run_starts)
            self._cache[key] = got
        return got


def _bmw_shard(terms: list[_BlockTerm], k: int, avgdl: float) -> list[tuple[float, int]]:
    """Vectorized two-stage retrieval over one (query, shard).

    Stage 0 (threshold bootstrap): decode the strongest term's best blocks in
    descending block-max order until >= k postings are seen; their single-term
    contributions are LOWER bounds on final scores, so the k-th largest is a
    safe threshold theta (the true k-th best final score is >= theta).

    Stage 1 (block-max prefilter — the coarse filter): a block of term i can
    contain a top-k doc only if bmax_i + sum(ub_j, j != i) >= theta; every
    other block is skipped without decoding. Safety: a doc absent from all
    surviving blocks has, via any term containing it, score <= that bound
    < theta <= true k-th score — the analogue of the MIH pigeonhole recall
    guarantee, but lossless (strict inequality keeps threshold ties alive
    for the docID tie-break).

    Stage 2 (exact rescore): for candidate docs (union of surviving blocks),
    decode every block that overlaps a candidate (including pruned ones —
    exactness requires all terms of a candidate) and accumulate exact float64
    contributions in ascending termID order.
    """
    full = [t.decode_full(avgdl) for t in terms]  # cached across the batch
    ubs = np.array([t.ub for t in terms])
    ub_sum = float(ubs.sum())
    # ---- stage 0a: candidate seeds — the strongest term's top-k docs by
    # single-term contribution (these are real docs; their exact scores are
    # true lower bounds on the final top-k threshold)
    theta = 0.0
    i_star = int(np.argmax(ubs))
    doc0, contr0 = full[i_star][0], full[i_star][1]
    if contr0.size >= k:
        seed_idx = np.argpartition(-contr0, k - 1)[:k]
        seed = np.unique(doc0[seed_idx])  # k distinct docs (doc0 is unique)
        # ---- stage 0b: exact-rescore the seeds; the k-th best FULL score is
        # a far tighter (still safe) threshold than the k-th single-term
        # lower bound — with the weak bound, a hot term's blocks are never
        # prunable in a mixed query (bmax_hot + ub_rare >= ub_rare >= theta)
        theta = float(np.sort(_rescore(full, seed))[-k])
    # ---- stage 1: block-max prefilter — candidates are the members of
    # surviving blocks only (numpy slice gather over the cached decode).
    # Safety: strict survival condition uses >=, so exact ties with the
    # threshold stay alive for the docID tie-break.
    cand_parts = []
    for i, t in enumerate(terms):
        doc, _contr, bstarts = full[i]
        bound = t.bmax + (ub_sum - ubs[i])
        surv = np.flatnonzero(bound >= theta)
        if surv.size == t.bmax.size:
            cand_parts.append(doc)
        elif surv.size:
            bends = np.append(bstarts[1:], doc.size)
            cand_parts.append(
                np.concatenate([doc[bstarts[b]:bends[b]] for b in surv])
            )
    if not cand_parts:
        return []
    cand = np.unique(np.concatenate(cand_parts))
    # ---- stage 2: exact rescore of candidates, accumulated in ascending
    # termID order (terms arrive in that order) over the cached contributions
    return _topk_vec(_rescore(full, cand), cand, k)


def _rescore(full, cand: np.ndarray) -> np.ndarray:
    """Exact scores for sorted unique candidate docIDs, accumulated over the
    terms in list order (ascending termID — float determinism). The binary
    search runs from whichever side is smaller: candidate-side lookup makes
    selective queries O(|cand| log |postings|) instead of O(|postings|)."""
    scores = np.zeros(cand.size, dtype=np.float64)
    for doc, contr, _bstarts in full:
        if cand.size < doc.size // 8:
            idx = np.searchsorted(doc, cand)
            idx_c = np.minimum(idx, doc.size - 1)
            m = (idx < doc.size) & (doc[idx_c] == cand)
            scores[m] += contr[idx[m]]
        else:
            pos = np.searchsorted(cand, doc)
            pos_c = np.minimum(pos, cand.size - 1)
            m = (pos < cand.size) & (cand[pos_c] == doc)
            scores[pos[m]] += contr[m]
    return scores


class _TermCursor:
    """Posting-stream cursor over one term's blocks within one shard.

    Skipped blocks are never decoded (the stage-1 saving); a block is decoded
    only when the cursor lands inside it.
    """

    __slots__ = ("term_id", "idf", "first", "last", "n", "bmax", "blobs",
                 "ub", "bi", "pos", "doc", "tf", "dl", "cur")

    def __init__(self, term_id, idf, first, last, n, bmax, blobs):
        self.term_id = term_id
        self.idf = idf
        self.first = first
        self.last = last
        self.n = n
        self.bmax = bmax
        self.blobs = blobs
        self.ub = float(bmax.max())  # shard-local term upper bound
        self.bi = -1
        self.pos = 0
        self.doc = None
        self.cur = -1
        self._enter_block(0, -1)

    def _enter_block(self, bi: int, target: int) -> None:
        while bi < len(self.blobs) and self.last[bi] < target:
            bi += 1  # skip whole blocks on metadata only — no decode
        if bi >= len(self.blobs):
            self.bi = len(self.blobs)
            self.cur = _INF
            return
        if bi != self.bi:
            self.bi = bi
            self.doc, self.tf, self.dl = codec.decode_run(self.blobs[bi], int(self.n[bi]))
        self.pos = int(np.searchsorted(self.doc, target)) if target > self.doc[0] else 0
        if self.pos >= len(self.doc):  # target fell in a gap past block end
            self._enter_block(self.bi + 1, target)
        else:
            self.cur = int(self.doc[self.pos])

    def next_geq(self, target: int) -> int:
        """Advance to the first docID >= target."""
        if self.cur >= target:
            return self.cur
        if self.bi < len(self.blobs) and target <= self.last[self.bi]:
            self.pos = int(np.searchsorted(self.doc, target, side="left"))
            if self.pos < len(self.doc):
                self.cur = int(self.doc[self.pos])
                return self.cur
            self._enter_block(self.bi + 1, target)
        else:
            self._enter_block(self.bi + 1 if self.bi >= 0 else 0, target)
        return self.cur

    def block_max(self) -> float:
        """Upper bound of the CURRENT block (block-max WAND refinement)."""
        return float(self.bmax[self.bi]) if self.bi < len(self.blobs) else 0.0

    def contribution(self, avgdl: float) -> float:
        """Exact stage-2 contribution at the current posting (float64)."""
        tf = float(self.tf[self.pos])
        dl = float(self.dl[self.pos])
        # identical association order to scoring.tf_part_col for bitwise equality
        return self.idf * (tf / (tf + scoring.K1 * ((1.0 - scoring.B) + scoring.B * (dl / avgdl))))


def _push_topk(heap: list, k: int, score: float, doc: int) -> None:
    item = (score, -doc)  # worst = lowest score, then largest docID
    if len(heap) < k:
        heapq.heappush(heap, item)
    elif item > heap[0]:
        heapq.heapreplace(heap, item)


def _theta(heap: list, k: int) -> float:
    return heap[0][0] if len(heap) == k else -1.0


def _wand_shard(cursors: list[_TermCursor], k: int, avgdl: float) -> list[tuple[float, int]]:
    """Block-max WAND over one (query, shard). Cursors are in termID order;
    scoring iterates them in that fixed order (float determinism)."""
    heap: list[tuple[float, int]] = []
    while True:
        order = sorted((c for c in cursors if c.cur != _INF), key=lambda c: c.cur)
        if not order:
            break
        th = _theta(heap, k)
        # pivot: shortest prefix whose UB sum could still beat the threshold
        acc, pivot_i = 0.0, -1
        for i, c in enumerate(order):
            acc += c.ub
            if acc >= th:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # even all terms together cannot reach the threshold
        pivot = order[pivot_i].cur
        if order[0].cur == pivot:
            aligned = [c for c in order if c.cur == pivot]
            # stage-1 block-max check: sum of CURRENT block maxima
            ub_bm = sum(c.block_max() for c in aligned)
            if len(heap) == k and ub_bm < th:
                for c in aligned:
                    c.next_geq(pivot + 1)
                continue
            # stage-2 exact rescore, accumulated in ascending termID order
            s = 0.0
            for c in cursors:
                if c.cur == pivot:
                    s += c.contribution(avgdl)
            if s > 0.0:
                _push_topk(heap, k, s, pivot)
            for c in aligned:
                c.next_geq(pivot + 1)
        else:
            # advance the highest-UB cursor strictly below the pivot docID
            # (guaranteed progress: its cur moves to >= pivot > old cur)
            below = [c for c in order[:pivot_i] if c.cur < pivot]
            cand = max(below, key=lambda c: c.ub)
            cand.next_geq(pivot)
    return [(s, -negd) for s, negd in heap]


def _single_term_topk(c: _TermCursor, k: int, avgdl: float) -> list[tuple[float, int]]:
    """Impact-ordered fast path for 1-term queries: visit blocks in descending
    block-max order and stop as soon as the next block cannot beat the
    threshold (the analogue of the reference's weighted subcode reordering,
    ``experiments/util.py:80-96`` — process most-informative first)."""
    heap: list[tuple[float, int]] = []
    for bi in np.argsort(-c.bmax, kind="stable"):
        if len(heap) == k and c.bmax[bi] < _theta(heap, k):
            break
        doc, tf, dl = codec.decode_run(c.blobs[bi], int(c.n[bi]))
        contribs = c.idf * scoring.tf_part_np(tf, dl, avgdl)
        for s, d in zip(contribs, doc):
            if s > 0.0:
                _push_topk(heap, k, float(s), int(d))
    return [(s, -negd) for s, negd in heap]


def _exact_shard(terms: list[_BlockTerm], k: int, avgdl: float) -> list[tuple[float, int]]:
    """Brute-force stage-2-only scoring (the ``es-long`` method analogue):
    decode everything (cached across the batch), vectorized accumulate in
    termID order, top-k."""
    full = [t.decode_full(avgdl) for t in terms]
    uniq = np.unique(np.concatenate([f[0] for f in full]))
    scores = np.zeros(len(uniq), dtype=np.float64)
    for doc, contr, _bstarts in full:  # terms arrive in termID order
        idx = np.searchsorted(uniq, doc)
        scores[idx] += contr
    return _topk_vec(scores, uniq, k)


def _make_kernel(qinfo: list[dict], avgdl: float, strategy: str):
    """mapInArrow kernel over postings rows sorted by (shard, termID, block_id).

    Emits per-(query, shard) top-k candidates; the global window merge picks
    the final top-k. Safe because per-shard thresholds only prune docs that
    lose within their own shard — a fortiori they lose globally.
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .session import disable_thp

        disable_thp()
        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        if tbl.num_rows == 0:
            return
        shard = tbl.column("shard").to_numpy()
        term = tbl.column("termID").to_numpy()
        first = tbl.column("first_docID").to_numpy()
        last = tbl.column("last_docID").to_numpy()
        n = tbl.column("n").to_numpy()
        bmax = tbl.column("max_impact").to_numpy()
        blobs = tbl.column("blob").to_pylist()
        out_q, out_d, out_s = [], [], []
        # iterate shard groups (rows pre-sorted by shard, termID, block_id)
        for sh in np.unique(shard):
            m = shard == sh
            sh_term, sh_first, sh_last = term[m], first[m], last[m]
            sh_n, sh_bmax = n[m], bmax[m]
            sh_idx = np.flatnonzero(m)
            term_rows = {
                int(t): np.flatnonzero(sh_term == t) for t in np.unique(sh_term)
            }
            decode_cache: dict = {}  # (termID, block) -> arrays, shared by queries
            for q in qinfo:
                args = []
                for term_id, idf in q["terms"]:  # ascending termID
                    rows = term_rows.get(term_id)
                    if rows is None:
                        continue
                    args.append(
                        (term_id, idf, sh_first[rows], sh_last[rows], sh_n[rows],
                         sh_bmax[rows], [blobs[sh_idx[r]] for r in rows])
                    )
                if not args:
                    continue
                if strategy == "wand":
                    bts = [_BlockTerm(*a, cache=decode_cache) for a in args]
                    top = _bmw_shard(bts, q["k"], avgdl)
                elif strategy == "exact":
                    bts = [_BlockTerm(*a, cache=decode_cache) for a in args]
                    top = _exact_shard(bts, q["k"], avgdl)
                elif strategy == "wand_daat":
                    cursors = [_TermCursor(*a) for a in args]
                    if len(cursors) == 1:
                        top = _single_term_topk(cursors[0], q["k"], avgdl)
                    else:
                        top = _wand_shard(cursors, q["k"], avgdl)
                else:
                    raise ValueError(f"unknown strategy {strategy!r}")
                for s, d in top:
                    out_q.append(q["qid"])
                    out_d.append(d)
                    out_s.append(s)
        yield pa.RecordBatch.from_pydict(
            {"qid": out_q, "docID": out_d, "score": out_s},
            schema=pa.schema([("qid", pa.int64()), ("docID", pa.int64()), ("score", pa.float64())]),
        )

    return kernel


def plan_queries(
    terms_df: DataFrame, queries: list[tuple[int, str, int]]
) -> tuple[list[dict], list[int]]:
    """Resolve query texts to [(termID, idf)] via the term dictionary.

    The dictionary lookup is a pushed-down ``term IN (...)`` point read — the
    analogue of the reference's by-id GETs into the ``nbs`` index
    (``es_query.7.x.json:63-99``).
    """
    all_terms = sorted({t for _, text, _ in queries for t in tokenize_py(text)})
    if not all_terms:
        return [], []
    lookup = {
        r["term"]: (r["termID"], r["idf"])
        for r in terms_df.where(F.col("term").isin(all_terms))
        .select("term", "termID", "idf")
        .collect()
    }
    qinfo = []
    needed: set[int] = set()
    for qid, text, k in queries:
        resolved = sorted(
            {lookup[t] for t in tokenize_py(text) if t in lookup}
        )  # distinct terms, ascending termID
        if resolved and k > 0:
            qinfo.append({"qid": qid, "k": int(k), "terms": resolved})
            needed.update(t for t, _ in resolved)
    return qinfo, sorted(needed)


def search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame | list[tuple[int, str, int]],
    strategy: str = "wand",
) -> DataFrame:
    """Run top-k queries against a built index.

    ``queries``: DataFrame(qid, text, k) or a list of (qid, text, k) tuples.
    ``strategy``: 'wand' (vectorized block-max two-stage, default), 'exact'
    (decode-everything rescore — the ``es-long`` analogue used for economics
    comparisons), or 'wand_daat' (document-at-a-time cursor WAND — reference
    implementation kept for cross-checking).
    Returns DataFrame(qid, rank, docID, score) under (score DESC, docID ASC).
    """
    meta, _docs, terms_df, postings = load_index(spark, index_dir)
    if isinstance(queries, DataFrame):
        qlist = [(r["qid"], r["text"], r["k"]) for r in queries.select("qid", "text", "k").collect()]
    else:
        qlist = list(queries)
    qinfo, needed_terms = plan_queries(terms_df, qlist)
    if not qinfo:
        return spark.createDataFrame([], "qid long, rank int, docID long, score double")

    posts = postings.where(F.col("termID").isin([int(t) for t in needed_terms]))
    # a doc's exact score needs every query term of its shard in one task, so
    # partition strictly by shard — 4x wider than the shard count to dodge
    # hash collisions (see build.py postings stage), and with an explicit
    # width so AQE cannot coalesce the scan down to a handful of tasks
    num_shards = int((meta.get("config") or {}).get("num_shards", 32))
    cand = (
        posts.repartition(4 * num_shards, "shard")
        .sortWithinPartitions("shard", "termID", "block_id")
        .mapInArrow(_make_kernel(qinfo, float(meta["avgdl"]), strategy), RESULT_SCHEMA)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docID"))
    ks = spark.createDataFrame([(q["qid"], q["k"]) for q in qinfo], "qid long, k int")
    return (
        cand.join(F.broadcast(ks), "qid")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("qid", "rank", "docID", "score")
    )
