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
    """One query term's block metadata + lazy decode cache within a shard.

    Decodes are per-BLOCK and lazy: the WAND path touches only the blocks the
    pruning bound or the candidate set require, and each decoded block's
    (docIDs, contributions) pair is cached in the shard-shared cache so
    queries with overlapping terms never decode a block twice."""

    __slots__ = ("term_id", "idf", "first", "last", "n", "bmax", "blobs",
                 "ub", "avgdl", "_cache")

    def __init__(self, term_id, idf, first, last, n, bmax, blobs, avgdl, cache=None):
        self.term_id = term_id
        self.idf = idf
        self.first = first
        self.last = last
        self.n = n
        self.bmax = bmax
        self.blobs = blobs
        self.avgdl = avgdl
        self.ub = float(bmax.max())
        # cache is shared per shard: queries with overlapping terms reuse decodes
        self._cache = cache if cache is not None else {}

    def gather(self, bis: np.ndarray):
        """(docIDs, contributions) concatenated over the given block indices
        (ascending). Uncached blocks are bulk-decoded in ONE codec pass
        (varbyte streams are self-terminating, so their blobs concatenate),
        then cached per block."""
        missing = [int(b) for b in bis if (self.term_id, int(b)) not in self._cache]
        if missing:
            ns = self.n[missing]
            doc, tf, dl, starts = codec.decode_runs_concat(
                [self.blobs[b] for b in missing], ns
            )
            contr = self.idf * scoring.tf_part_np(tf, dl, self.avgdl)
            for j, b in enumerate(missing):
                s, e = starts[j], starts[j + 1]
                self._cache[(self.term_id, b)] = (doc[s:e], contr[s:e])
        parts = [self._cache[(self.term_id, int(b))] for b in bis]
        if len(parts) == 1:
            return parts[0]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def decode_full(self):
        """All of this term's shard postings in one vectorized decode —
        computed ONCE per (shard, term) and reused by every query in the
        batch. This is the EXACT strategy's primitive (decode-everything is
        its definition); the WAND path uses :meth:`gather` instead."""
        key = (self.term_id, -1)
        got = self._cache.get(key)
        if got is None:
            doc, tf, dl, run_starts = codec.decode_runs_concat(self.blobs, self.n)
            contr = self.idf * scoring.tf_part_np(tf, dl, self.avgdl)
            got = (doc, contr, run_starts)
            self._cache[key] = got
        return got


def _bmw_shard(
    terms: list[_BlockTerm], k: int, counter: dict | None = None
) -> list[tuple[float, int]]:
    """Vectorized two-stage retrieval over one (query, shard) — blocks are
    decoded LAZILY; pruned blocks that contain no candidate are never
    touched, which is the entire economic point of the coarse filter.

    Stage 0 (threshold bootstrap): decode the strongest term's best blocks in
    descending block-max order until >= k postings are seen; take the top-k
    docs by single-term contribution as seeds and exact-rescore them (real
    docs, so their full scores are true lower bounds on the final top-k
    threshold theta — far tighter than the single-term bound, without which
    a hot term's blocks are never prunable in a mixed query).

    Stage 1 (block-max prefilter — the coarse filter): a block of term i can
    contain a top-k doc only if bmax_i + sum(ub_j, j != i) >= theta; every
    other block is skipped without decoding. Safety: a doc absent from all
    surviving blocks has, via any term containing it, score <= that bound
    < theta <= true k-th score — the analogue of the MIH pigeonhole recall
    guarantee (slides p.7-8), but lossless (the >= survival condition keeps
    threshold ties alive for the docID tie-break).

    Stage 2 (exact rescore): for candidate docs (union of surviving blocks),
    decode every block that overlaps a candidate (including pruned ones —
    exactness requires all terms of a candidate) and accumulate exact float64
    contributions in ascending termID order — bit-identical to the exact
    strategy because per candidate the same contributions add in the same
    order.

    ``counter`` (optional) accumulates the measured economics:
    blocks_total / blocks_touched / candidates.
    """
    accessed: set[tuple[int, int]] = set()

    def fetch(t: _BlockTerm, bis: np.ndarray):
        accessed.update((t.term_id, int(b)) for b in bis)
        return t.gather(bis)

    ubs = np.array([t.ub for t in terms])
    # ---- stage 0: seed the threshold with the strongest term's EXACT
    # single-term top-k (impact-ordered block walk: visit blocks in
    # descending bmax, stop when the next block max cannot beat the running
    # k-th contribution — the weighted-subcode-reorder idea,
    # experiments/util.py:80-96). The seeds are real docs; their exact
    # multi-term rescores are lower bounds on the true top-k threshold.
    theta = 0.0
    seeds: list[np.ndarray] = []
    n_seeds = 0
    for ti in np.argsort(-ubs, kind="stable"):
        t0 = terms[int(ti)]
        order0 = np.argsort(-t0.bmax, kind="stable")
        top_c = np.empty(0)
        top_d = np.empty(0, dtype=np.int64)
        for bi in order0:
            if top_c.size >= k and float(t0.bmax[bi]) < top_c[-1]:
                break
            d, c = fetch(t0, np.array([bi]))
            merged_c = np.concatenate([top_c, c])
            merged_d = np.concatenate([top_d, d])
            sel = np.lexsort((merged_d, -merged_c))[:k]
            top_c, top_d = merged_c[sel], merged_d[sel]
        seeds.append(top_d)
        n_seeds = np.unique(np.concatenate(seeds)).size
        # a term with >= k shard postings yields k seeds on its own; weaker
        # terms chain in (rare+hot queries: the rare term alone has < k
        # postings, and without seeds theta stays 0 and nothing prunes)
        if n_seeds >= k:
            break
    if n_seeds >= k:
        seed = np.unique(np.concatenate(seeds))
        theta = float(np.sort(_rescore_lazy(terms, seed, fetch))[-k])
    # ---- stage 1: block-max prefilter with BLOCK-ALIGNED cross-term bounds.
    # For block b of term i spanning docIDs [first_b, last_b], any member d
    # satisfies impact_j(d) <= bmax_j(the j-block containing d), and that
    # j-block's index is >= searchsorted(last_j, first_b) — so the suffix
    # maximum of term j's bmax from that index is a safe upper bound. Under
    # impact-ordered docIDs the suffix maxima decay, making this bound
    # dramatically tighter than the global sum of term upper bounds (which
    # never prunes a mixed query: bmax_hot + ub_rare >= any theta).
    sufmax = [
        np.concatenate([np.maximum.accumulate(t.bmax[::-1])[::-1], [0.0]])
        for t in terms
    ]
    # MaxScore term split: order terms by shard-local upper bound ascending;
    # the largest prefix whose ub sum is STRICTLY below theta is
    # non-essential — a doc containing only those terms scores < theta and
    # can never enter the top-k, so candidates need only come from the
    # essential terms' blocks. This is what kills the hot-term scan in a
    # rare+hot query: theta > ub_hot makes the hot term non-essential and
    # its postings are decoded only where a rare candidate needs rescoring —
    # the literal structure of the reference's two-stage design (cheap
    # recall-safe filter on the selective structure, exact rerank on
    # survivors).
    asc = np.argsort(ubs, kind="stable")
    csum = np.cumsum(ubs[asc])
    non_essential = {int(asc[p]) for p in range(len(terms)) if csum[p] < theta}
    cand_parts = []
    for i, t in enumerate(terms):
        if i in non_essential:
            continue
        others = np.zeros(t.bmax.size)
        for j, tj in enumerate(terms):
            if j != i:
                lo = np.searchsorted(tj.last, t.first, side="left")
                # blocks of i that no block of j intersects contribute 0
                # from j (no member can have a j posting at all) — the big
                # win for rare-term + hot-term mixes
                lo_c = np.minimum(lo, tj.first.size - 1)
                overlaps = (lo < tj.first.size) & (tj.first[lo_c] <= t.last)
                others += np.where(overlaps, sufmax[j][lo], 0.0)
        surv = np.flatnonzero(t.bmax + others >= theta)
        if surv.size:
            d, _c = fetch(t, surv)
            cand_parts.append(d)
    if not cand_parts:
        return []
    cand = np.unique(np.concatenate(cand_parts))
    # ---- stage 2: exact rescore of candidates in ascending termID order
    scores = _rescore_lazy(terms, cand, fetch)
    if counter is not None:
        counter["blocks_total"] += sum(len(t.blobs) for t in terms)
        counter["blocks_touched"] += len(accessed)
        counter["candidates"] += int(cand.size)
    return _topk_vec(scores, cand, k)


def _rescore_lazy(terms: list[_BlockTerm], cand: np.ndarray, fetch) -> np.ndarray:
    """Exact scores for sorted unique candidate docIDs: per term, decode only
    the blocks whose [first, last] docID range contains a candidate, then
    accumulate with the same searchsorted scheme as :func:`_rescore`."""
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms:  # ascending termID — float determinism
        lo = np.searchsorted(cand, t.first, side="left")
        hi = np.searchsorted(cand, t.last, side="right")
        bis = np.flatnonzero(hi > lo)
        if bis.size == 0:
            continue
        doc, contr = fetch(t, bis)
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
    ``experiments/util.py:80-96`` — process most-informative first).
    Vectorized: per visited block the contributions fold into the running
    top-k via :func:`_topk_vec` — no per-posting Python loop."""
    top: list[tuple[float, int]] = []
    theta = -1.0
    for bi in np.argsort(-c.bmax, kind="stable"):
        if len(top) == k and c.bmax[bi] < theta:
            break
        doc, tf, dl = codec.decode_run(c.blobs[bi], int(c.n[bi]))
        contribs = c.idf * scoring.tf_part_np(tf, dl, avgdl)
        merged_s = np.concatenate([[s for s, _d in top], contribs])
        merged_d = np.concatenate([[d for _s, d in top], doc]).astype(np.int64)
        top = _topk_vec(merged_s, merged_d, k)
        if len(top) == k:
            theta = top[-1][0]
    return top


def _exact_shard(terms: list[_BlockTerm], k: int) -> list[tuple[float, int]]:
    """Brute-force stage-2-only scoring (the ``es-long`` method analogue):
    decode everything (cached across the batch), vectorized accumulate in
    termID order, top-k."""
    full = [t.decode_full() for t in terms]
    uniq = np.unique(np.concatenate([f[0] for f in full]))
    scores = np.zeros(len(uniq), dtype=np.float64)
    for doc, contr, _bstarts in full:  # terms arrive in termID order
        idx = np.searchsorted(uniq, doc)
        scores[idx] += contr
    return _topk_vec(scores, uniq, k)


# sentinel qids for the optional economics rows (filtered out of results)
_STATS_QIDS = {"blocks_total": -1, "blocks_touched": -2, "candidates": -3}


def _blob_views(tbl: pa.Table) -> list[memoryview]:
    """Zero-copy per-row views into the binary column's data buffers — no
    per-row Python bytes materialization (the same buffer-slice scheme the
    merge kernel uses, build.py). Chunk-aware: no combine_chunks, so >2 GiB
    of total blob bytes per partition never overflows int32 offsets."""
    views: list[memoryview] = []
    for ch in tbl.column("blob").chunks:
        offs = np.frombuffer(ch.buffers()[1], dtype=np.int32)
        base = ch.offset
        data = memoryview(ch.buffers()[2])
        views.extend(
            data[offs[base + i]: offs[base + i + 1]] for i in range(len(ch))
        )
    return views


def _make_kernel(qinfo: list[dict], avgdl: float, strategy: str,
                 collect_stats: bool = False, safe_bounds: bool = False):
    """mapInArrow kernel over postings rows sorted by (shard, termID, block_id).

    Emits per-(query, shard) top-k candidates; the global window merge picks
    the final top-k. Safe because per-shard thresholds only prune docs that
    lose within their own shard — a fortiori they lose globally.

    With ``collect_stats``, sentinel rows (qid < 0) carry the partition's
    summed pruning economics; ``search(with_stats=True)`` aggregates them.
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
        if safe_bounds:
            # post-append: stored max_impact was computed under build-time
            # (idf, avgdl) which the append changed — rebuild a safe bound
            # from the idf/avgdl-free block stats under CURRENT stats
            # (append.py; tf_part increasing in tf, decreasing in dl, so
            # tf_part(max_tf, min_dl) >= tf_part of any member posting).
            # idf multiplies in per term below.
            bmax_part = scoring.tf_part_np(
                tbl.column("max_tf").to_numpy(),
                tbl.column("min_dl").to_numpy(),
                avgdl,
            )
            bmax = None
        else:
            bmax = tbl.column("max_impact").to_numpy()
        blobs = _blob_views(tbl)
        counter = {k: 0 for k in _STATS_QIDS} if collect_stats else None
        out_q, out_d, out_s = [], [], []
        # iterate shard groups (rows pre-sorted by shard, termID, block_id)
        for sh in np.unique(shard):
            m = shard == sh
            sh_term, sh_first, sh_last = term[m], first[m], last[m]
            sh_n = n[m]
            sh_bmax = bmax_part[m] if safe_bounds else bmax[m]
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
                    tb = sh_bmax[rows] * idf if safe_bounds else sh_bmax[rows]
                    args.append(
                        (term_id, idf, sh_first[rows], sh_last[rows], sh_n[rows],
                         tb, [blobs[sh_idx[r]] for r in rows])
                    )
                if not args:
                    continue
                if strategy == "wand":
                    bts = [_BlockTerm(*a, avgdl=avgdl, cache=decode_cache) for a in args]
                    top = _bmw_shard(bts, q["k"], counter)
                elif strategy == "exact":
                    bts = [_BlockTerm(*a, avgdl=avgdl, cache=decode_cache) for a in args]
                    top = _exact_shard(bts, q["k"])
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
        if counter is not None:
            for name, qid in _STATS_QIDS.items():
                out_q.append(qid)
                out_d.append(counter[name])
                out_s.append(0.0)
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
    with_stats: bool = False,
):
    """Run top-k queries against a built index.

    ``queries``: DataFrame(qid, text, k) or a list of (qid, text, k) tuples.
    ``strategy``: 'wand' (vectorized block-max two-stage, default), 'exact'
    (decode-everything rescore — the ``es-long`` analogue used for economics
    comparisons), or 'wand_daat' (document-at-a-time cursor WAND — reference
    implementation kept for cross-checking).
    Returns DataFrame(qid, rank, docID, score) under (score DESC, docID ASC);
    with ``with_stats`` (wand only), returns (DataFrame, stats dict) where
    stats carries the measured pruning economics (blocks_total /
    blocks_touched / candidates summed over every (query, shard) pair) — the
    quantitative form of the reference's two-stage-vs-exact comparison
    (slides p.16). The stats pass materializes the kernel output once
    (persist) so results and counters come from the same execution.
    """
    meta, _docs, terms_df, postings = load_index(spark, index_dir)
    if isinstance(queries, DataFrame):
        qlist = [(r["qid"], r["text"], r["k"]) for r in queries.select("qid", "text", "k").collect()]
    else:
        qlist = list(queries)
    qinfo, needed_terms = plan_queries(terms_df, qlist)
    if not qinfo:
        empty = spark.createDataFrame([], "qid long, rank int, docID long, score double")
        return (empty, dict.fromkeys(_STATS_QIDS, 0)) if with_stats else empty

    posts = postings.where(F.col("termID").isin([int(t) for t in needed_terms]))
    # a doc's exact score needs every query term of its shard in one task, so
    # partition strictly by shard — 4x wider than the shard count to dodge
    # hash collisions (see build.py postings stage), and with an explicit
    # width so AQE cannot coalesce the scan down to a handful of tasks
    num_shards = int((meta.get("config") or {}).get("num_shards", 32))
    cand = (
        posts.repartition(4 * num_shards, "shard")
        .sortWithinPartitions("shard", "termID", "block_id")
        .mapInArrow(
            _make_kernel(qinfo, float(meta["avgdl"]), strategy,
                         collect_stats=with_stats,
                         safe_bounds=bool(meta.get("appended"))),
            RESULT_SCHEMA,
        )
    )
    if with_stats and any(q["qid"] < 0 for q in qinfo):
        # the stats rows travel as sentinel negative qids in the kernel
        # output; a caller-supplied negative qid would be summed into the
        # counters and dropped from the results — refuse instead
        raise ValueError("with_stats=True requires non-negative qids")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docID"))
    ks = spark.createDataFrame([(q["qid"], q["k"]) for q in qinfo], "qid long, k int")

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(ks), "qid")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("qid", "rank", "docID", "score")
        )

    if with_stats:
        # one materialization serves both results and counters: the result
        # set is top-k bounded (<= sum(k) * shards rows), so collecting it
        # locally is cheap and lets the persisted kernel output be released
        # immediately instead of leaking in executor storage
        cand = cand.persist()
        try:
            stats_rows = cand.where(F.col("qid") < 0).groupBy("qid").agg(
                F.sum("docID").alias("v")
            ).collect()
            by_qid = {r["qid"]: int(r["v"]) for r in stats_rows}
            stats = {name: by_qid.get(qid, 0) for name, qid in _STATS_QIDS.items()}
            rows = topk(cand.where(F.col("qid") >= 0)).collect()
        finally:
            cand.unpersist()
        out = spark.createDataFrame(
            rows, "qid long, rank int, docID long, score double"
        )
        return out, stats
    return topk(cand)
