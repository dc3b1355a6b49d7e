"""Operator-level tests: two-stage Hamming retrieval (the reference's literal
operator), multimodal plumbing, sessionization, dedup/text additions.

The Hamming tests mirror the reference's evaluation questions directly:
does the MIH prefilter honour the pigeonhole recall guarantee (slides p.7-8),
and does the exact rerank equal a brute-force popcount oracle
(``dh/tools/add_hdist.py:18-22``)?
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elastichash_spark.operators import hamming, multimodal, sessions, similarity, textstats


# ---------------------------------------------------------------- fixtures

def _vec_from_code(code: int, dim: int = 64) -> list[float]:
    """Embedding whose binarization reproduces ``code`` bit-exactly:
    bit j of subcode i == sign of dim 16i+j."""
    out = []
    for i in range(4):
        sub = (code >> (16 * i)) & 0xFFFF
        for j in range(16):
            out.append(1.0 if (sub >> j) & 1 else -1.0)
    return out


@pytest.fixture(scope="module")
def code_emb(spark):
    """64 deterministic codes + 3 probes with known Hamming structure."""
    rng = np.random.Generator(np.random.PCG64(7))
    codes = [int(x) for x in rng.integers(0, 2**63, size=64, dtype=np.int64)]
    rows = [(i, _vec_from_code(c)) for i, c in enumerate(codes)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return emb, codes


def _hd(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------- hamming

def test_nbs_masks_count():
    """1 + C(16,1) + C(16,2) = 137 — the reference's neighbor-list size
    (create_nbs_index.py:37-52, slides p.12)."""
    masks = hamming.nbs_masks(16, 2)
    assert len(masks) == 137
    assert len(set(masks)) == 137
    assert all(bin(m).count("1") <= 2 for m in masks)


def test_subcode_packing_roundtrip(spark, code_emb):
    emb, codes = code_emb
    got = {
        r["vec_id"]: sum(r[f"f{i}"] << (16 * i) for i in range(4))
        for r in hamming.with_subcodes(emb).collect()
    }
    assert got == {i: c for i, c in enumerate(codes)}


def test_hamming_topk_matches_popcount_oracle(spark, code_emb):
    emb, codes = code_emb
    probes = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    got = hamming.hamming_topk(emb, probes, k=5).collect()
    for qid in (0, 1):
        want = sorted(
            ((64 - _hd(codes[qid], c), i) for i, c in enumerate(codes)),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        rows = sorted((r for r in got if r["qid"] == qid), key=lambda r: r["rank"])
        assert [(r["score"], r["vec_id"]) for r in rows] == want


def test_twostage_pigeonhole_recall(spark):
    """Any doc within 64-bit HD <= 11 of the query has some 16-bit subcode
    within HD <= 2 (pigeonhole) and MUST survive the prefilter; build docs at
    every distance 0..11 spread adversarially across subcodes."""
    q = 0x0123456789ABCDEF
    rng = np.random.Generator(np.random.PCG64(11))
    docs = []
    for d in range(12):
        c = q
        flips = rng.choice(64, size=d, replace=False)
        for f in flips:
            c ^= 1 << int(f)
        docs.append((d, _vec_from_code(c)))
    # plus one far-away doc that may legitimately be filtered out
    far = q ^ ((1 << 64) - 1)
    docs.append((99, _vec_from_code(far)))
    emb = docs[0][1]
    spark_emb = spark.createDataFrame(docs, "vec_id long, embedding array<float>")
    probes = spark.createDataFrame([(0, emb)], "qid long, vec array<float>")
    got = hamming.hamming_twostage(spark_emb, probes, k=13, d=2).collect()
    ids = {r["vec_id"] for r in got}
    assert set(range(12)) <= ids  # every HD<=11 doc survived


def test_twostage_equals_filtered_exact(spark, code_emb):
    """twostage == exact ranking restricted to the candidate predicate
    (min subcode HD <= 2) — the es_query.7.x.json semantics."""
    emb, codes = code_emb
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    got = hamming.hamming_twostage(emb, probes, k=10, d=2).collect()
    for qid in (0, 1, 2):
        cands = [
            (64 - _hd(codes[qid], c), i)
            for i, c in enumerate(codes)
            if min(
                _hd((codes[qid] >> (16 * s)) & 0xFFFF, (c >> (16 * s)) & 0xFFFF)
                for s in range(4)
            )
            <= 2
        ]
        want = sorted(cands, key=lambda t: (-t[0], t[1]))[:10]
        rows = sorted((r for r in got if r["qid"] == qid), key=lambda r: r["rank"])
        assert [(r["score"], r["vec_id"]) for r in rows] == want


# ---------------------------------------------------------------- multimodal

@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"imagebytes-0001", "image/png", 8, 8, None),
        (2, "audio", b"audiobytes-0002", "audio/wav", None, None, 2500),
        (3, "video", b"0123456789abcdefghij", "video/mp4", 4, 4, 3500),
        (4, "video", b"xy", "video/mp4", 4, 4, 500),
        (5, "image", None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_features_stub_gate(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        multimodal.decode_features(media, fake=False).collect()


def test_decode_features_fake_deterministic(spark, media):
    a = {r["media_id"]: r["features"] for r in multimodal.decode_features(media, fake=True).collect()}
    b = {r["media_id"]: r["features"] for r in multimodal.decode_features(media, fake=True).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for k, v in a.items() if v is not None)
    assert a[5] is None  # null payload -> null features
    assert all(-1.0 <= x < 1.0 for v in a.values() if v is not None for x in v)
    assert a[1] != a[2]


def test_frame_sample_reassembles_payload(spark, media):
    rows = multimodal.frame_sample(media, every_ms=1000, fake=True).collect()
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {3, 4}  # only videos
    assert len(by_media[3]) == 3  # 3500ms // 1000
    assert len(by_media[4]) == 1  # max(1, 500//1000)
    for mid, payload in ((3, b"0123456789abcdefghij"), (4, b"xy")):
        frames = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        assert [f["frame_ts_ms"] for f in frames] == [i * 1000 for i in range(len(frames))]
        assert b"".join(bytes(f["frame_payload"]) for f in frames) == payload


# ---------------------------------------------------------------- sessions

def test_sessionize_gap_boundaries(spark):
    ts = F.to_timestamp
    rows = [
        # user 1: 3 events in one session, then a 31-min gap -> new session
        (1, 1, "2026-01-01 10:00:00"),
        (2, 1, "2026-01-01 10:10:00"),
        (3, 1, "2026-01-01 10:40:00"),  # 30:00 gap == limit -> same session
        (4, 1, "2026-01-01 11:10:01"),  # 30:01 gap -> new session
        # user 2: single event
        (5, 2, "2026-01-01 09:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string").select(
        "event_id", "user_id", ts("ts_s").alias("ts")
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessions.sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in sessions.session_stats(ev, gap_minutes=30).collect()
    }
    assert stats == {(1, 1): (3, 2400), (1, 2): (1, 0), (2, 1): (1, 0)}


# ---------------------------------------------------------------- text/dedup

def test_token_counts_golden(spark):
    rows = [
        (1, "Hello, world! 42 times"),
        (2, "   "),
        (3, None),
        (4, "a-b c_d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in textstats.token_counts(docs).collect()
    }
    # bpe(1): hello , world ! 42 times = 6; bpe(4): a - b c _ d = 6
    assert got == {1: (4, 6), 2: (0, 0), 3: (0, 0), 4: (2, 6)}


def test_neardup_pairs_finds_clones(spark):
    base = [[float(i + j) for j in range(4)] for i in range(5)]
    rows = [(i, v) for i, v in enumerate(base)] + [(100, base[0]), (101, base[3])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in similarity.neardup_pairs(emb, threshold=0.99999).collect()}
    assert (0, 100) in got and (3, 101) in got
    assert all(a < b for a, b in got)


# ------------------------------------------------- multi-band LSH similarity

def _clustered_emb(n_clusters=6, per_cluster=30, dim=64, noise=0.05):
    """Tight clusters around random unit centers — the regime where ANN
    recall is measurable (random uniform vectors have no near neighbours)."""
    rng = np.random.Generator(np.random.PCG64(11))
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + noise * rng.normal(size=dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return rows


def test_ann_multiband_recall_floor(spark):
    """Multi-band ANN must reach recall >= 0.9 vs the exact top-k on a
    clustered corpus (the quality contract of the approximate prefilter,
    the short-vs-long table analogue, reference slides p.15)."""
    rows = _clustered_emb()
    emb = spark.createDataFrame(
        [(i, v) for i, _c, v in rows], "vec_id long, embedding array<float>"
    )
    probes = emb.where(F.col("vec_id").isin([0, 30, 60, 90])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    exact = similarity.cosine_topk(emb, probes, k=10)
    approx = similarity.ann_topk(emb, probes, k=10, n_planes=6, n_bands=4)
    e = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    a = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"ANN recall {recall:.3f} below floor"


def test_neardup_lsh_matches_exact_oracle(spark):
    """The distributed LSH+verify near-dup path returns exactly the pairs the
    O(n^2) test oracle finds (threshold 0.999 -> miss probability ~1e-10)."""
    rng = np.random.Generator(np.random.PCG64(23))
    base = [[float(x) for x in rng.normal(size=16)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    # exact clones + one near-clone (tiny perturbation)
    rows += [(100, base[0]), (101, base[1])]
    rows.append((102, [x * 1.000001 + 1e-7 for x in base[2]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = {
        (r["id_a"], r["id_b"], r["sim_r"])
        for r in similarity.neardup_pairs(emb, threshold=0.999).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["sim_r"])
        for r in similarity.neardup_pairs_exact(emb, threshold=0.999).collect()
    }
    assert lsh == exact
    assert {(a, b) for a, b, _s in lsh} >= {(0, 100), (1, 101), (2, 102)}


def test_neardup_exact_row_cap(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="test oracle"):
        similarity.neardup_pairs_exact(emb, max_rows=10).collect()


# ------------------------------------------------------- jaccard verification

def test_jaccard_verify_hot_shingle_no_quadratic(spark):
    """1,000 docs sharing one stop shingle: the two-stage path (LSH cand +
    array_intersect verify) completes and finds exactly the true clone pairs;
    the plan contains no shingle self-join to go quadratic on."""
    from elastichash_spark.operators import dedup

    hot = "x y z"
    rows = [(i, f"{hot} unique{i} filler{i} tail{i} tok{i}a tok{i}b") for i in range(1000)]
    rows += [(2001, "a real duplicate sentence body here"), (2002, "a real duplicate sentence body here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles(docs, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id", n_perms=8)
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id", band_size=2)
    got = dedup.jaccard_verify(sh, cand, "doc_id", threshold=0.9).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs == {(2001, 2002)}
    # the quadratic join row count the old plan would have paid: ~500k rows
    # for the hot shingle alone; candidate count here stays tiny
    assert cand.count() < 5000


def test_jaccard_pairs_max_df_guard(spark):
    """max_df drops stop shingles from candidate generation in the self-join
    path; true duplicate pairs (overlapping on rare shingles too) survive."""
    from elastichash_spark.operators import dedup

    rows = [(i, f"the common prefix words unique{i} one{i} two{i}") for i in range(50)]
    rows += [(900, "totally distinct clone text body alpha beta gamma"),
             (901, "totally distinct clone text body alpha beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles(docs, "doc_id", "text", n=3)
    got = dedup.jaccard_pairs(sh, "doc_id", threshold=0.9, max_df=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(900, 901)}


# ------------------------------------------------------- AP@k / mAP harness

def test_ap_py_pinned_values():
    """Hand-computed threshold-stepwise AP (sklearn semantics, ties grouped)."""
    from elastichash_spark.operators.evaluation import ap_py

    # thresholds: 5 (n=2,tp=1), 4 (n=1,tp=1), 3 (n=2,tp=1); pos=3
    # AP = 1/3*1/2 + 1/3*2/3 + 1/3*3/5
    assert abs(ap_py([1, 0, 1, 1, 0], [5, 5, 4, 3, 3]) - (1/6 + 2/9 + 1/5)) < 1e-12
    assert ap_py([0, 0, 0], [3, 2, 1]) == 0.0
    assert ap_py([], []) == 0.0
    assert abs(ap_py([1, 1], [2, 1]) - 1.0) < 1e-12
    # single threshold, all tied
    assert abs(ap_py([1, 0], [2, 2]) - 0.5) < 1e-12


def test_ap_at_k_matches_python_twin(spark):
    """The Spark operator equals ap_py on a randomized tied-score fixture."""
    from elastichash_spark.operators.evaluation import ap_at_k, ap_py

    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    expect = {}
    for qid in range(6):
        n = 10
        scores = [int(s) for s in rng.integers(0, 5, size=n)]  # heavy ties
        rels = [int(r) for r in rng.integers(0, 2, size=n)]
        order = sorted(range(n), key=lambda i: (-scores[i], i))
        for rank, i in enumerate(order, start=1):
            rows.append((qid, rank, float(scores[i]), rels[i]))
        for k in (5, 10):
            top = order[:k]
            expect[(qid, k)] = round(
                ap_py([rels[i] for i in top], [scores[i] for i in top]), 6
            )
    ranked = spark.createDataFrame(rows, "qid long, rank int, score double, rel int")
    got = {
        (r["qid"], r["k"]): round(r["ap"], 6)
        for r in ap_at_k(ranked, ks=(5, 10)).collect()
    }
    assert got == expect


def test_ann_map_quality_vs_exact(spark):
    """The measured-quality contract for the approximate path: on a clustered
    corpus with cluster labels, multi-band ANN mAP@10 stays within 10% of the
    exact ranking's mAP@10 (the reference's twostage-vs-long mAP delta,
    slides p.15: 95.1 vs 95.35 at k=10)."""
    from elastichash_spark.operators.evaluation import map_at_k, with_label_relevance

    rows = _clustered_emb()
    emb = spark.createDataFrame(
        [(i, v) for i, _c, v in rows], "vec_id long, embedding array<float>"
    )
    labels = spark.createDataFrame(
        [(i, c) for i, c, _v in rows], "vec_id long, label int"
    )
    probes = emb.where(F.col("vec_id").isin([0, 30, 60, 90])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    exact = similarity.cosine_topk(emb, probes, k=10).withColumnRenamed("sim_r", "score")
    approx = similarity.ann_topk(emb, probes, k=10, n_planes=6, n_bands=4).withColumnRenamed("sim_r", "score")
    m_exact = {
        r["k"]: r["map"]
        for r in map_at_k(with_label_relevance(exact, labels), ks=(10,)).collect()
    }
    m_approx = {
        r["k"]: r["map"]
        for r in map_at_k(with_label_relevance(approx, labels), ks=(10,)).collect()
    }
    assert m_exact[10] > 0.9  # clusters are tight: exact retrieval is clean
    assert m_approx[10] >= 0.9 * m_exact[10], (m_approx, m_exact)


# ------------------------------------------------------- code statistics

def test_bit_correlations_match_numpy_corrcoef(spark):
    """bit_correlations equals 1-|np.corrcoef| on the binarized matrix —
    the exact quantity correlations.py:103-107 writes."""
    from elastichash_spark.operators import codestats

    rng = np.random.Generator(np.random.PCG64(3))
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    mat[:, 5] = 1.0   # degenerate: always 1 -> undefined corr, must be skipped
    mat[:, 6] = -1.0  # degenerate: never fires
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["bit_x"], r["bit_y"]): r["w_r"]
        for r in codestats.bit_correlations(emb, bits=8).collect()
    }
    bits = (mat > 0).astype(np.float64)
    corr = np.corrcoef(bits.T)
    expect = {}
    for x in range(8):
        for y in range(x):
            if x in (5, 6) or y in (5, 6):
                continue
            c = abs(corr[x, y])
            if c > 0:
                expect[(x, y)] = round(1.0 - c, 6)
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-6, (k, got[k], expect[k])


def test_bit_counts_golden(spark):
    from elastichash_spark.operators import codestats

    emb = spark.createDataFrame(
        [(0, [1.0, -1.0, 1.0]), (1, [1.0, 1.0, -0.5]), (2, [-1.0, 0.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["bit"]: (r["ones"], r["zeros"]) for r in codestats.bit_counts(emb, bits=3).collect()}
    assert got == {0: (2, 1), 1: (1, 2), 2: (2, 1)}


def test_ball_predicate_equals_neighbor_expansion():
    """popcount(f XOR q) <= d  ⇔  f ∈ {q XOR m : m ∈ nbs_masks(d)} — the
    Spark-side ball predicate is exactly the reference's precomputed
    neighbor-set membership (create_nbs_index.py:37-62)."""
    rng = np.random.Generator(np.random.PCG64(17))
    masks = set(hamming.nbs_masks(16, 2))
    for _ in range(200):
        q = int(rng.integers(0, 1 << 16))
        f = int(rng.integers(0, 1 << 16))
        by_pred = bin(f ^ q).count("1") <= 2
        by_set = f in {q ^ m for m in masks}
        assert by_pred == by_set


def test_partition_bits_finds_decorrelated_groups():
    """Planted structure: even-even and odd-odd bit pairs are highly
    correlated (decorrelation weight 0.1), cross pairs decorrelated (0.9).
    KL semantics (decorrelate.py: min cut of the 1-|corr| graph = max
    internal weight) demand each subcode mix evens and odds 2+2 — internal
    weight 3.8 per group, vs 0.6 for a segregated all-even group."""
    from elastichash_spark.operators.codestats import partition_bits

    edges = []
    for a in range(8):
        for b in range(a + 1, 8):
            w = 0.1 if (a % 2) == (b % 2) else 0.9
            edges.append((a, b, w))
    groups = partition_bits(edges, bits=8, group_size=4)

    def internal(gs):
        wmap = {(a, b): w for a, b, w in edges}
        return sum(
            wmap[(min(a, b), max(a, b))]
            for g in gs for i, a in enumerate(g) for b in g[i + 1:]
        )

    assert sorted(sum(groups, [])) == list(range(8))
    assert all(len(g) == 4 for g in groups)
    # the optimum (any 2-even+2-odd split) has internal weight 3.8 per group
    assert abs(internal(groups) - 2 * 3.8) < 1e-9
    for g in groups:
        assert sum(1 for b in g if b % 2 == 0) == 2
    # determinism
    assert groups == partition_bits(edges, bits=8, group_size=4)


def test_ivf_recall_floor(spark):
    """IVF (spherical k-means cells + nprobe probing + exact rescore) must
    reach recall >= 0.9 vs exact cosine top-k on a clustered corpus — the
    same quality contract as the multi-band LSH path."""
    rows = _clustered_emb()
    emb = spark.createDataFrame(
        [(i, v) for i, _c, v in rows], "vec_id long, embedding array<float>"
    )
    probes = emb.where(F.col("vec_id").isin([0, 30, 60, 90])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    exact = similarity.cosine_topk(emb, probes, k=10)
    approx = similarity.ivf_topk(emb, probes, k=10, n_centroids=8, nprobe=2)
    e = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    a = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall {recall:.3f} below floor"
    # determinism: same call, same rows
    again = {(r["qid"], r["vec_id"]) for r in similarity.ivf_topk(
        emb, probes, k=10, n_centroids=8, nprobe=2).collect()}
    assert a == again


def test_sessionize_salted_equals_plain(spark):
    """The skew-safe (user, time-bucket) split with boundary repair assigns
    exactly the same session_idx to every event as the plain single-window
    form — randomized fixture with boundary-adjacent events, ts ties, and a
    hot user whose one session spans many buckets."""
    import datetime as dt

    from elastichash_spark.operators.sessions import sessionize, sessionize_salted

    rng = np.random.Generator(np.random.PCG64(9))
    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for user in range(6):
        t = 0
        for _ in range(80):
            # mixture of tiny gaps (same session), exact-gap boundaries,
            # and big jumps (new session)
            r = rng.random()
            if r < 0.5:
                t += int(rng.integers(0, 120))        # within-session
            elif r < 0.65:
                t += 1800                              # exactly the gap: same session
            elif r < 0.8:
                t += 1801                              # just past: new session
            else:
                t += int(rng.integers(1900, 90000))    # far jump
            rows.append((eid, user, base + dt.timedelta(seconds=t)))
            eid += 1
    # hot user 99: one continuous session spanning many 30-min buckets
    t = 0
    for _ in range(300):
        t += 60
        rows.append((eid, 99, base + dt.timedelta(seconds=t)))
        eid += 1
    # ts ties (ordering falls to event_id)
    rows.append((eid, 5, base)); eid += 1
    rows.append((eid, 5, base)); eid += 1

    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    plain = {
        r["event_id"]: r["session_idx"] for r in sessionize(ev, 30).collect()
    }
    for bucket_minutes in (30, 90, 1440):
        salted = {
            r["event_id"]: r["session_idx"]
            for r in sessionize_salted(ev, 30, bucket_minutes=bucket_minutes).collect()
        }
        assert salted == plain, f"bucket_minutes={bucket_minutes}"


def test_connected_components_transitive_groups(spark):
    """A~B, B~C (A~C never emitted) must cluster all three under min id;
    chains, disjoint pairs, duplicate/reversed edges and self-loops all
    resolve."""
    from elastichash_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 2), (2, 2), (10, 11), (20, 21), (21, 22),
         (22, 23), (23, 24)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20, 24: 20}


def test_dedup_then_search_composition(spark, tmp_path):
    """Curation→retrieval composition (the suite's ``dedup_search`` shape):
    a corpus with one near-dup cluster is deduplicated (keeper = min id),
    the two-stage index is built over the KEPT set, and search must (a)
    never surface a dropped doc, (b) surface the keeper, and (c) compute
    corpus statistics from the kept set only — a term whose every
    occurrence was deduplicated away ceases to exist in the index."""
    from elastichash_spark import oracle
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.operators import dedup
    from elastichash_spark.query import search

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),        # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta theta"),  # near-dup of 1
        (10, "omicron alpha kappa sigma tau"),
        (11, "lambda mu nu xi omicron pi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles(docs, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id", n_perms=8)
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id", band_size=2)
    pairs = dedup.jaccard_verify(sh, cand, "doc_id", threshold=0.3)
    cc = dedup.connected_components(pairs.select("id_a", "id_b"))
    drops = cc.where(F.col("id") != F.col("cluster"))
    assert {r["id"] for r in drops.collect()} == {2, 3}
    kept = docs.join(drops.select(F.col("id").alias("doc_id")),
                     "doc_id", "left_anti")

    idx = str(tmp_path / "idx")
    meta = build_index(spark, kept, idx,
                       IndexConfig(num_shards=2, salt_buckets=2),
                       resume=False, id_cols=["doc_id"])
    assert meta["n_docs"] == 3  # 1, 10, 11 — stats over the kept set only
    id_map = spark.read.parquet(idx + "/docs").select("docID", "doc_id")

    hits = search(spark, idx, [(0, "alpha beta", 10)], "wand") \
        .join(id_map, "docID")
    got = {r["doc_id"] for r in hits.collect()}
    assert 1 in got and got.isdisjoint({2, 3})
    # 'theta' existed only in dropped doc 3: deduplicated out of the index
    assert search(spark, idx, [(1, "theta", 10)], "wand").count() == 0
    # ranking equals the exact oracle over the kept corpus (both sides
    # assign docID as the same ordinal rank over doc_id, so the ids align)
    qdf = spark.createDataFrame([(0, "alpha omicron", 5)],
                                "qid long, text string, k int")
    ora = oracle.oracle_topk(kept, qdf, id_cols=["doc_id"])
    eng = search(spark, idx, qdf, "wand")
    assert (
        sorted((r["qid"], r["rank"], r["docID"]) for r in eng.collect())
        == sorted((r["qid"], r["rank"], r["docID"]) for r in ora.collect())
    )


def test_randomized_dedup_search_composition(spark, tmp_path):
    """Randomized adversarial sweep of the dedup→index→search composition:
    random Zipf corpora with INJECTED duplicate clusters (exact copies and
    one-token edits). The drop set is recomputed by a brute Python
    union-find over the verified pair set (the closure is the composition
    step this sweep owns — pair generation itself is certified by the
    standalone dedup tests/oracles), and search over the deduplicated
    index must match the exact BM25 oracle over the kept corpus on random
    query mixes (absent terms, duplicate tokens, k beyond matches)."""
    import numpy as np

    from elastichash_spark import oracle
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.operators import dedup
    from elastichash_spark.query import search

    for seed in (11, 22):
        rng = np.random.Generator(np.random.PCG64(seed))
        vocab = [f"w{i:02d}" for i in range(20)]
        probs = 1.0 / np.arange(1, len(vocab) + 1)
        probs /= probs.sum()
        rows = []
        for i in range(60):
            n_tok = int(rng.integers(1, 18))
            rows.append((i, " ".join(rng.choice(vocab, size=n_tok, p=probs))))
        base = dict(rows)
        for j, src in enumerate(rng.choice(60, size=8, replace=False)):
            rows.append((1000 + j, base[int(src)]))  # exact copy
        for j, src in enumerate(rng.choice(60, size=5, replace=False)):
            rows.append((2000 + j, base[int(src)] + " " + vocab[j]))  # edit
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        sh = dedup.shingles(docs, "doc_id", "text", n=3)
        sigs = dedup.minhash_signatures(sh, "doc_id", n_perms=8)
        cand = dedup.lsh_candidate_pairs(sigs, "doc_id", band_size=2)
        pairs = dedup.jaccard_verify(sh, cand, "doc_id", threshold=0.3)
        cc = dedup.connected_components(pairs.select("id_a", "id_b"))

        # brute union-find closure over the same verified pair set
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            a, b = find(r["id_a"]), find(r["id_b"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        want_drop = {x for x in parent if find(x) != x}
        got_drop = {
            r["id"]
            for r in cc.where(F.col("id") != F.col("cluster")).collect()
        }
        assert got_drop == want_drop, f"seed={seed}"

        kept = docs.join(
            cc.where(F.col("id") != F.col("cluster"))
            .select(F.col("id").alias("doc_id")),
            "doc_id", "left_anti",
        )
        d = str(tmp_path / f"dfuzz{seed}")
        build_index(spark, kept, d,
                    IndexConfig(num_shards=2, salt_buckets=2, block_size=8),
                    resume=False, id_cols=["doc_id"])
        queries = []
        for qi in range(8):
            terms = list(rng.choice(vocab + ["zzabsent"],
                                    size=int(rng.integers(1, 5))))
            if qi % 3 == 0:
                terms.append(terms[0])
            queries.append((qi, " ".join(terms),
                            int(rng.choice([1, 5, 100]))))
        qdf = spark.createDataFrame(queries, "qid long, text string, k int")
        eng = search(spark, d, qdf, "wand")
        ora = oracle.oracle_topk(kept, qdf, id_cols=["doc_id"])
        assert (
            sorted((r["qid"], r["rank"], r["docID"]) for r in eng.collect())
            == sorted((r["qid"], r["rank"], r["docID"]) for r in ora.collect())
        ), f"seed={seed}"


def test_connected_components_long_path_converges(spark):
    """Large-star/small-star converges on diameter-50 and diameter-200 path
    graphs in O(log^2 n) rounds (the long-chain crawl-dedup shape that killed
    the old diameter-bounded label propagation) — default max_iters, guard
    silent, every node labeled with the component minimum."""
    from elastichash_spark.operators import dedup

    for n in (50, 200):
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a long, id_b long"
        )
        got = {
            r["id"]: r["cluster"]
            for r in dedup.connected_components(chain).collect()
        }
        assert got == {i: 0 for i in range(n + 1)}, f"path n={n}"
    # the loud guard still exists: one round cannot star-collapse a 50-path
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iters=1)


def test_permute_bits_matches_reference_permute_code(spark):
    """permute_bits is the distributed twin of the reference's permute_code
    (experiments/util.py:77-78): binarized output == permuting the binarized
    bitstring; reorder_permutation reproduces reorder_code's exact index
    arithmetic (util.py:80-96) including its tie behavior."""
    from elastichash_spark.operators import codestats

    rng = np.random.Generator(np.random.PCG64(9))
    mat = rng.normal(size=(20, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    perm = codestats.reorder_permutation([0.05, 0.40, 0.15, 0.30], group_size=4)

    # reference index arithmetic, computed independently
    order = [g for _w, g in sorted(
        zip([0.05, 0.40, 0.15, 0.30], range(4)), reverse=True)]
    assert perm == [order[i // 4] * 4 + i % 4 for i in range(16)]

    got = {
        r["vec_id"]: r["embedding"]
        for r in codestats.permute_bits(emb, perm).collect()
    }
    for i, row in enumerate(mat):
        bitstring = "".join("1" if x > 0 else "0" for x in row)
        want = "".join(bitstring[p] for p in perm)  # permute_code literal
        got_bits = "".join("1" if x > 0 else "0" for x in got[i])
        assert got_bits == want, f"vec {i}"
    # bijection guard
    with pytest.raises(ValueError, match="bijection"):
        codestats.permute_bits(emb, [0, 0, 1])


def test_assignment_permutation_realizes_partition(spark):
    """Applying a partition_bits assignment via assignment_permutation +
    permute_bits + contiguous grouping yields EXACTLY the per-group weights
    of subcode_edge_weights(assignment=...) on the original layout, and the
    computed partition never loses internal weight vs the contiguous one
    (KL-objective parity, decorrelate.py:94-97)."""
    from elastichash_spark.operators import codestats

    # planted structure as in test_partition_bits: even/odd blocks correlate
    rng = np.random.Generator(np.random.PCG64(21))
    base = rng.normal(size=(80, 2))
    noise = rng.normal(scale=0.3, size=(80, 8))
    mat = np.empty((80, 8), dtype=np.float32)
    for b in range(8):
        mat[:, b] = base[:, b % 2] + noise[:, b]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    edges = [
        (r["bit_y"], r["bit_x"], r["w_r"])
        for r in codestats.bit_correlations(emb, bits=8).collect()
    ]
    groups = codestats.partition_bits(edges, bits=8, group_size=4)
    perm = codestats.assignment_permutation(groups)
    assignment = {b: g for g, grp in enumerate(groups) for b in grp}

    via_assignment = {
        r["grp"]: (r["n_edges"], r["weight_u"])
        for r in codestats.subcode_edge_weights(
            emb, bits=8, group_size=4, assignment=assignment
        ).collect()
    }
    via_permute = {
        r["grp"]: (r["n_edges"], r["weight_u"])
        for r in codestats.subcode_edge_weights(
            codestats.permute_bits(emb, perm), bits=8, group_size=4
        ).collect()
    }
    assert via_permute == via_assignment
    contiguous = codestats.subcode_edge_weights(emb, bits=8, group_size=4)
    w_contig = sum(r["weight_u"] for r in contiguous.collect())
    w_perm = sum(v[1] for v in via_permute.values())
    assert w_perm >= w_contig


# ------------------------------------------------------------------ curation


def test_decontaminate_golden(spark):
    """Hand-checkable 3-gram overlaps: a verbatim copy of an eval doc, a
    partial (single-shingle) overlap below threshold, a clean doc, and a
    too-short doc; repeated shingles within one doc count once (DISTINCT)."""
    from elastichash_spark.operators import curation

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )  # eval shingles: {alpha beta gamma, beta gamma delta}
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # both shingles -> 2, contaminated
            (2, "x alpha beta gamma y"),          # one shingle -> 1, clean at thr=2
            (3, "one two three four"),            # no overlap -> 0
            (4, "alpha beta"),                    # too short for a 3-gram -> 0
            (5, "alpha beta gamma alpha beta gamma"),  # dup shingle counts once... 
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hit_ngrams"], r["contaminated"])
        for r in curation.decontaminate(train, ev, n=3, threshold=2).collect()
    }
    # doc 5 shingles: {alpha beta gamma, beta gamma alpha, gamma alpha beta}
    # -> exactly one distinct eval hit
    assert got == {1: (2, True), 2: (1, False), 3: (0, False),
                   4: (0, False), 5: (1, False)}


def test_repetition_golden(spark):
    from elastichash_spark.operators import curation

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),   # 4 tokens, 2 distinct -> dup 0.5; bigrams a-a x2, a-b -> top 2/3
            (2, "x y z"),     # all distinct -> dup 0; bigrams unique -> top 1/2
            (3, "solo"),      # one token: no bigrams -> 0.0
            (4, ""),          # empty -> all zeros
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_unigram_frac_r"], r["top_bigram_frac_r"])
        for r in curation.repetition_stats(docs).collect()
    }
    assert got[1] == (4, 0.5, round(2 / 3, 6))
    assert got[2] == (3, 0.0, 0.5)
    assert got[3] == (1, 0.0, 0.0)
    assert got[4] == (0, 0.0, 0.0)


def test_pii_redact_golden(spark):
    from elastichash_spark.operators import curation

    docs = spark.createDataFrame(
        [
            (1, "reach Bob.Smith+x@Mail.EXAMPLE.org or 555.123.4567 now"),
            (2, "no pii here"),
            (3, "a@b.co and c.d@e-f.org twice, call 800-555-0100"),
            (4, None),
            (5, "Dear Ann, WRITE a@b.io Today"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_emails"], r["n_phones"])
        for r in curation.pii_redact(docs).collect()
    }
    assert got[1] == ("reach <EMAIL> or <PHONE> now", 1, 1)
    assert got[2] == ("no pii here", 0, 0)
    assert got[3] == ("<EMAIL> and <EMAIL> twice, call <PHONE>", 2, 1)
    assert got[4] == ("", 0, 0)
    # original case survives outside the redacted spans (no baked-in
    # lowercasing); the mixed-case email still matches
    assert got[5] == ("Dear Ann, WRITE <EMAIL> Today", 1, 0)


def test_stratified_sample_semantics(spark):
    """rate-1 keeps the whole stratum, rate-0/absent strata drop entirely,
    fractional rates match the python h60 membership rule exactly, and the
    operator is rerun-stable; invalid rates are rejected."""
    import pytest as _pytest

    from elastichash_spark.operators import curation
    from elastichash_spark.operators.hashing import h60_py

    rows = [(i, f"text body number {i}", f"s{i % 3}") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rates = {"s0": 1.0, "s1": 0.5}  # s2 absent -> dropped
    got = {
        r["doc_id"]: r["source"]
        for r in curation.stratified_sample(docs, rates).collect()
    }
    want = {
        i: src
        for i, text, src in rows
        if src in rates and h60_py(text) % 1_000_000 < int(rates[src] * 1_000_000)
    }
    assert got == want
    assert {src for src in got.values()} == {"s0", "s1"}
    assert sum(1 for s in got.values() if s == "s0") == 40  # rate 1.0: all kept
    again = {
        r["doc_id"]: r["source"]
        for r in curation.stratified_sample(docs, rates).collect()
    }
    assert again == got
    with _pytest.raises(ValueError, match="rate"):
        curation.stratified_sample(docs, {"s0": 1.5})
    with _pytest.raises(ValueError, match="stratum"):
        curation.stratified_sample(docs, {})


# ---------------------------------------------------------------- aggs


def test_significant_terms_golden(spark):
    """Hand-computed JLH on a 10-doc corpus: an over-represented term wins,
    a term at exactly background rate is dropped (fp > bp is strict), an
    under-represented term is dropped, top_n cuts on (score DESC, term ASC)."""
    from elastichash_spark.operators import aggs

    # corpus: term 'a' in docs 1..10 (df 10), 'b' in 1..5 (df 5), 'c' in 1,2 (df 2)
    doc_terms = spark.createDataFrame(
        [(d, "a") for d in range(1, 11)]
        + [(d, "b") for d in range(1, 6)]
        + [(d, "c") for d in (1, 2)],
        "doc_id long, term string",
    )
    term_df = doc_terms.groupBy("term").agg(F.count("*").alias("df"))
    # foreground for qid 0: docs {1, 2} -> fp(a)=1.0=bp(a) dropped;
    # fp(b)=1.0 vs bp 0.5 -> (0.5)*(2)=1.0; fp(c)=1.0 vs bp 0.2 -> (0.8)*(5)=4.0
    matches = spark.createDataFrame([(0, 1), (0, 2)], "qid long, doc_id long")
    got = [
        (r["qid"], r["term"], r["fg_count"], r["bg_count"], r["score_r"])
        for r in aggs.significant_terms(matches, doc_terms, term_df, n_docs=10)
        .orderBy(F.desc("score_r"), "term").collect()
    ]
    assert got == [(0, "c", 2, 2, 4.0), (0, "b", 2, 5, 1.0)]
    # top_n=1 keeps only the highest-JLH term
    top1 = aggs.significant_terms(matches, doc_terms, term_df, n_docs=10, top_n=1)
    assert [r["term"] for r in top1.collect()] == ["c"]
    with pytest.raises(ValueError, match="n_docs"):
        aggs.significant_terms(matches, doc_terms, term_df, n_docs=0)


def test_highlight_golden(spark):
    """Snippet windows: head-clamp when the match sits near the start, full
    left context when deep, earliest-of-several-terms anchoring, and the
    head-of-doc fallback when no query term occurs as a substring."""
    from elastichash_spark.operators import aggs

    pad = "x" * 50
    docs = spark.createDataFrame(
        [
            (1, "Alpha comes first here"),            # match at pos 1 -> start 1
            (2, pad + "NEEDLE tail"),                  # match at 51 -> start 21
            (3, "zz beta then alpha later"),           # beta@4 < alpha@14 -> min
            (4, "nothing relevant at all"),            # no term -> head snippet
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 4, 4)], "qid long, rank int, doc_id long"
    )
    qterms = spark.createDataFrame(
        [(0, "alpha"), (0, "beta"), (0, "needle")], "qid long, term string"
    )
    got = {
        r["doc_id"]: r["snippet"]
        for r in aggs.highlight(hits, docs, qterms, before=20, width=30).collect()
    }
    assert got[1] == "alpha comes first here"          # start clamped to 1
    assert got[2] == ("x" * 20 + "needle tai")         # 51-20=31 .. 30 wide
    assert got[3] == "zz beta then alpha later"        # anchored on beta (pos 4)
    assert got[4] == "nothing relevant at all"         # fallback: head of doc
    assert len(got) == 4


def test_pack_sequences_golden(spark):
    """Hand-checked packing: per-group running offsets, a doc straddling a
    budget boundary spans 2 sequences, a doc exactly filling a sequence
    spans 1, a 0-token doc spans 0; invalid budget/n_groups rejected."""
    from elastichash_spark.operators import curation

    # group 0 (even ids), budget 8: id0 5 tok, id2 3 tok (fills seq 0
    # exactly), id4 10 tok (starts seq 1, spans into seq 2), id6 empty.
    # group 1 (odd ids): id1 4 tok, id3 6 tok (straddles 8-boundary).
    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),
            (2, "f g h"),
            (4, "one two three four five six seven eight nine ten"),
            (6, "..."),
            (1, "w x y z"),
            (3, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["group"], r["start_tok"], r["n_tokens"],
                      r["seq_id"], r["n_seqs"])
        for r in curation.pack_sequences(docs, budget=8, n_groups=2).collect()
    }
    assert got == {
        0: (0, 0, 5, 0, 1),
        2: (0, 5, 3, 0, 1),    # tokens 5..7: exactly fills sequence 0
        4: (0, 8, 10, 1, 2),   # tokens 8..17: sequences 1 and 2
        6: (0, 18, 0, 2, 0),   # empty doc: lands nowhere
        1: (1, 0, 4, 0, 1),
        3: (1, 4, 6, 0, 2),    # tokens 4..9: straddles the 8-boundary
    }
    with pytest.raises(ValueError, match="budget"):
        curation.pack_sequences(docs, budget=0)
    with pytest.raises(ValueError, match="n_groups"):
        curation.pack_sequences(docs, budget=8, n_groups=0)


def test_unigram_logprob_golden(spark):
    """Hand-computed unigram NLL on a 3-doc corpus: counts a=3, b=2, c=1 of
    6 total; repeated tokens weight by tf; empty doc scores 0 with 0
    tokens."""
    import math

    from elastichash_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    pa_, pb, pc = 3 / 6, 2 / 6, 1 / 6
    want = {
        1: (3, round((2 * -math.log(pa_) + -math.log(pb)) / 3, 6)),
        2: (3, round((-math.log(pa_) - math.log(pb) - math.log(pc)) / 3, 6)),
        3: (0, 0.0),
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_per_tok_r"])
        for r in curation.unigram_logprob(docs).collect()
    }
    assert got == want
    # rare tokens score strictly worse than common ones
    assert got[2][1] > got[1][1]


def test_dup_ngram_coverage_golden(spark):
    from elastichash_spark.operators import curation

    docs = spark.createDataFrame(
        [
            # "a b c d e" repeats at starts 1 and 6 -> covers 1-5 and 6-10
            # of 11 positions
            (1, "a b c d e a b c d e f"),
            # every 5-gram is "s s s s s" -> full coverage
            (2, "s s s s s s"),
            # two distinct 5-grams, no repeats
            (3, "one two three four five six"),
            (4, "tiny doc"),  # shorter than one gram
            (5, ""),          # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_ngram_frac_r"])
        for r in curation.dup_ngram_coverage(docs, n=5).collect()
    }
    assert got[1] == (11, round(10 / 11, 6))
    assert got[2] == (6, 1.0)
    assert got[3] == (6, 0.0)
    assert got[4] == (2, 0.0)
    assert got[5] == (0, 0.0)
    # n is a real parameter: bigram coverage of an alternating loop is total
    bi = curation.dup_ngram_coverage(
        spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string"),
        n=2,
    ).collect()[0]
    assert (bi["n_tokens"], bi["dup_ngram_frac_r"]) == (5, 1.0)
    with pytest.raises(ValueError, match="n must be"):
        curation.dup_ngram_coverage(docs, n=0)


def test_rank_eval_matches_python_twin(spark):
    """rank_eval's P/R/RR/NDCG equal a brute-Python recomputation on a
    randomized fixture including zero-relevant queries (rec=rr=ndcg=0) and a
    pos_total larger than k (IDCG capped at k)."""
    import math

    from elastichash_spark.operators.evaluation import rank_eval

    rng = np.random.Generator(np.random.PCG64(11))
    rows, tot_rows, expect = [], [], {}
    for qid in range(6):
        n = 10
        rels = [0] * n if qid == 5 else [int(r) for r in rng.integers(0, 2, size=n)]
        pos_total = 0 if qid == 5 else int(sum(rels) + rng.integers(0, 15))
        tot_rows.append((qid, pos_total))
        for rank, rel in enumerate(rels, start=1):
            rows.append((qid, rank, rel))
        for k in (5, 10):
            top = rels[:k]
            prec = sum(top) / len(top)
            rec = sum(top) / pos_total if pos_total else 0.0
            first = next((i + 1 for i, r in enumerate(top) if r), None)
            rr = 1.0 / first if first else 0.0
            dcg = sum(r / math.log2(i + 2) for i, r in enumerate(top))
            m = min(k, pos_total)
            idcg = sum(1.0 / math.log2(i + 2) for i in range(m))
            ndcg = dcg / idcg if idcg > 0 else 0.0
            expect[(qid, k)] = tuple(round(v, 6) for v in (prec, rec, rr, ndcg))
    ranked = spark.createDataFrame(rows, "qid long, rank int, rel int")
    tot = spark.createDataFrame(tot_rows, "qid long, pos_total long")
    got = {
        (r["qid"], r["k"]): tuple(
            round(r[c], 6) for c in ("prec", "rec", "rr", "ndcg"))
        for r in rank_eval(ranked, tot, ks=(5, 10)).collect()
    }
    assert got == expect


def test_top_hits_salted_two_phase_exact(spark):
    """top_hits' salted two-phase top-n equals the naive single-window
    top-n on a randomized skewed fixture (one hot bucket with heavy
    rounded-score ties), across salt_buckets settings."""
    from elastichash_spark.operators.aggs import top_hits

    rng = np.random.Generator(np.random.PCG64(23))
    rows, meta = [], []
    for d in range(300):
        # one hot facet absorbs ~80% of docs; scores tie heavily at 6dp
        meta.append((d, "hot" if d % 5 else f"cold{d % 3}"))
    for qid in range(3):
        for d in range(300):
            if rng.random() < 0.7:
                rows.append((qid, d, float(rng.integers(0, 4)) / 2))
    matches = spark.createDataFrame(rows, "qid long, doc_id long, score double")
    docs = spark.createDataFrame(meta, "doc_id long, source string")
    want = None
    for sb in (1, 4, 64):
        got = sorted(
            (r["qid"], r["source"], r["rank"], r["doc_id"], r["score"])
            for r in top_hits(matches, docs, "source", n=3,
                              salt_buckets=sb).collect()
        )
        if want is None:
            want = got  # sb=1 == the naive single global window
        assert got == want, f"salt_buckets={sb}"
    assert len(want) > 0


def test_cardinality_exact_and_hll(spark):
    """cardinality: exact distinct + value_count match a pandas brute; the
    HLL form is within 10% on the same fixture."""
    from elastichash_spark.operators.aggs import cardinality

    rng = np.random.Generator(np.random.PCG64(29))
    meta = [(d, f"s{int(rng.integers(0, 40))}") for d in range(500)]
    rows = [(q, d) for q in range(2) for d in range(500)
            if rng.random() < 0.6]
    matches = spark.createDataFrame(rows, "qid long, doc_id long")
    docs = spark.createDataFrame(meta, "doc_id long, source string")
    src = dict(meta)
    want = {}
    for q in range(2):
        vals = [src[d] for qq, d in rows if qq == q]
        want[q] = (len(set(vals)), len(vals))
    got = {r["qid"]: (r["cardinality"], r["value_count"])
           for r in cardinality(matches, docs, "source").collect()}
    assert got == want
    hll = {r["qid"]: r["cardinality"]
           for r in cardinality(matches, docs, "source",
                                approximate=True).collect()}
    for q in range(2):
        assert abs(hll[q] - want[q][0]) <= max(2, 0.1 * want[q][0])


def test_parent_topk_score_modes(spark):
    """parent_topk equals a pandas brute for every score_mode on a
    randomized fixture; bad mode raises."""
    from elastichash_spark.operators.aggs import parent_topk
    from pyspark.sql import functions as F

    rng = np.random.Generator(np.random.PCG64(31))
    rows = [(q, d, float(rng.integers(1, 50)) / 7)
            for q in range(3) for d in range(200) if rng.random() < 0.5]
    scored = spark.createDataFrame(rows, "qid long, doc_id long, score double")
    for mode in ("max", "sum", "avg", "count"):
        got = {
            (r["qid"], r["parent"]): (r["rank"], r["n_children"],
                                      round(r["pscore"], 9))
            for r in parent_topk(
                scored, (F.col("doc_id") / 10).cast("long"),
                score_mode=mode, k=5).collect()
        }
        want = {}
        for q in range(3):
            agg: dict[int, list[float]] = {}
            for qq, d, s in rows:
                if qq == q:
                    agg.setdefault(d // 10, []).append(s)
            red = {"max": max, "sum": sum,
                   "avg": lambda v: sum(v) / len(v),
                   "count": lambda v: float(len(v))}[mode]
            ranked = sorted(agg.items(),
                            key=lambda kv: (-round(red(kv[1]), 6), kv[0]))[:5]
            for i, (p, v) in enumerate(ranked, 1):
                want[(q, p)] = (i, len(v), round(red(v), 9))
        assert got == want, mode
    with pytest.raises(ValueError, match="score_mode"):
        parent_topk(scored, (F.col("doc_id") / 10).cast("long"),
                    score_mode="min")


def test_percentiles_exact_and_approx(spark):
    """percentiles (exact): matches numpy's linear-interpolation quantile
    (the (n-1)*p convention both engines pin); the TDigest-ish approximate
    form stays within 5% of exact on the same fixture."""
    from elastichash_spark.operators.aggs import percentiles

    rng = np.random.Generator(np.random.PCG64(37))
    meta = [(d, int(rng.integers(10, 5000))) for d in range(400)]
    rows = [(q, d) for q in range(2) for d in range(400) if rng.random() < 0.7]
    matches = spark.createDataFrame(rows, "qid long, doc_id long")
    docs = spark.createDataFrame(meta, "doc_id long, n long")
    ps = (0.25, 0.5, 0.75, 0.99)
    got = {(r["qid"], r["pct"]): r["value"]
           for r in percentiles(matches, docs, "n", ps).collect()}
    nv = dict(meta)
    for q in range(2):
        vals = np.array(sorted(nv[d] for qq, d in rows if qq == q), float)
        for p in ps:
            assert abs(got[(q, p)] - float(np.quantile(vals, p))) < 1e-9
    approx = {(r["qid"], r["pct"]): r["value"]
              for r in percentiles(matches, docs, "n", ps,
                                   approximate=True).collect()}
    for k, v in got.items():
        assert abs(approx[k] - v) <= max(25.0, 0.05 * v), k


def test_extended_stats_matches_numpy(spark):
    """extended_stats: BIGINT power-sum moments equal numpy's population
    statistics on a randomized match set."""
    from elastichash_spark.operators.aggs import extended_stats

    rng = np.random.Generator(np.random.PCG64(41))
    meta = [(d, int(rng.integers(1, 4000))) for d in range(300)]
    rows = [(q, d) for q in range(3) for d in range(300) if rng.random() < 0.6]
    matches = spark.createDataFrame(rows, "qid long, doc_id long")
    docs = spark.createDataFrame(meta, "doc_id long, n long")
    got = {r["qid"]: r for r in extended_stats(matches, docs, "n").collect()}
    nv = dict(meta)
    for q in range(3):
        vals = np.array([nv[d] for qq, d in rows if qq == q], dtype=float)
        g = got[q]
        assert g["n"] == len(vals)
        assert g["min_v"] == int(vals.min()) and g["max_v"] == int(vals.max())
        assert g["sum_v"] == int(vals.sum())
        assert abs(g["avg_r"] - round(float(vals.mean()), 6)) < 1e-9
        assert abs(g["var_r"] - float(np.var(vals))) < 1e-5
        assert abs(g["std_r"] - float(np.std(vals))) < 1e-5


def test_histogram_bucket_edges(spark):
    """histogram: values on and around bucket boundaries land in the ES
    floor(v/interval)*interval bucket; invalid interval raises."""
    from elastichash_spark.operators.aggs import histogram

    meta = [(0, 0), (1, 63), (2, 64), (3, 127), (4, 128), (5, 129)]
    matches = spark.createDataFrame(
        [(0, d) for d, _v in meta], "qid long, doc_id long")
    docs = spark.createDataFrame(meta, "doc_id long, v long")
    got = {r["bucket"]: r["n_docs"]
           for r in histogram(matches, docs, "v", 64).collect()}
    assert got == {0: 2, 64: 2, 128: 2}
    with pytest.raises(ValueError, match="interval"):
        histogram(matches, docs, "v", 0)


def test_filters_counts_overlap_and_empty(spark):
    """filters_counts: overlapping named buckets count independently, an
    unsatisfiable bucket stays in the response with 0 (ES keeps empty named
    buckets), and every (qid, name) pair appears exactly once."""
    from elastichash_spark.operators.aggs import filters_counts

    meta = [(d, d * 10, "en" if d % 2 == 0 else "de") for d in range(8)]
    rows = [(0, d) for d in range(8)] + [(1, d) for d in range(4)]
    matches = spark.createDataFrame(rows, "qid long, doc_id long")
    docs = spark.createDataFrame(meta, "doc_id long, n long, lang string")
    filt = {"big": "n >= 40", "en": "lang = 'en'", "none": "n < 0"}
    got = {(r["qid"], r["bucket"]): r["n_docs"]
           for r in filters_counts(matches, docs, filt).collect()}
    nv = {d: (n, la) for d, n, la in meta}
    want = {}
    for q, ds in ((0, range(8)), (1, range(4))):
        want[(q, "big")] = sum(1 for d in ds if nv[d][0] >= 40)
        want[(q, "en")] = sum(1 for d in ds if nv[d][1] == "en")
        want[(q, "none")] = 0
    assert got == want
    with pytest.raises(ValueError, match="non-empty"):
        filters_counts(matches, docs, {})


def test_field_value_factor_modifiers(spark):
    """field_value_factor: log1p / sqrt / none multipliers match the math
    twin; docs missing from the metadata use the ``missing`` field value."""
    import math

    from elastichash_spark.operators.function_score import field_value_factor

    scored = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (0, 99, 4.0)],
        "qid long, doc_id long, score double")
    docs = spark.createDataFrame([(1, 100), (2, 300)], "doc_id long, f long")
    for mod, fn in (("log1p", lambda x: math.log1p(x)),
                    ("sqrt", math.sqrt), ("none", lambda x: x)):
        got = {r["doc_id"]: r["score"]
               for r in field_value_factor(
                   scored, docs, "f", factor=0.01, modifier=mod,
                   missing=50.0).collect()}
        assert abs(got[1] - 2.0 * fn(1.0)) < 1e-12
        assert abs(got[2] - 1.0 * fn(3.0)) < 1e-12
        assert abs(got[99] - 4.0 * fn(0.5)) < 1e-12  # missing -> 50 * 0.01
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor(scored, docs, "f", modifier="log2p")


def test_cross_dup_ngram_coverage_golden(spark):
    """cross_dup_ngram_coverage: only grams shared across >= min_docs
    DISTINCT docs count (within-doc repetition alone does NOT — the key
    contrast with dup_ngram_coverage); short docs score 0; coverage is the
    union of covered positions, checked against a python twin."""
    from elastichash_spark.operators.curation import cross_dup_ngram_coverage

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),       # shares 1..5 with 2
        (2, "alpha beta gamma delta epsilon other words"),
        (3, "loop loop loop loop loop loop loop loop"),    # within-doc only
        (4, "tiny doc"),                                    # < n tokens
        (5, "loop loop loop loop loop stop"),               # shares with 3
    ]
    got = {r["doc_id"]: r for r in cross_dup_ngram_coverage(
        spark.createDataFrame(docs, "doc_id long, text string"), n=5
    ).collect()}

    def twin():
        toks = {d: t.split() for d, t in docs}
        grams: dict[tuple, set] = {}
        for d, ts in toks.items():
            for i in range(len(ts) - 4):
                grams.setdefault(tuple(ts[i:i + 5]), set()).add(d)
        dup = {g for g, ds in grams.items() if len(ds) >= 2}
        out = {}
        for d, ts in toks.items():
            cov = set()
            for i in range(len(ts) - 4):
                if tuple(ts[i:i + 5]) in dup:
                    cov.update(range(i, i + 5))
            out[d] = (len(ts), round(len(cov) / len(ts), 6) if ts else 0.0)
        return out

    want = twin()
    assert want[3][1] > 0.0  # 3 and 5 share 'loop'*5 -> cross-doc
    assert want[1][1] > 0.0 and want[4][1] == 0.0
    for d, (nt, frac) in want.items():
        assert got[d]["n_tokens"] == nt
        assert abs(got[d]["cross_dup_frac_r"] - frac) < 1e-9, d
    with pytest.raises(ValueError, match="min_docs"):
        cross_dup_ngram_coverage(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_docs=1)
