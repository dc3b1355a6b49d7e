"""Oracle self-consistency: stats vs brute pandas recomputation (FIXTURES.md
§4.8), docID stability, query-term semantics, top-k ordering."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from elastichash_spark import oracle, scoring
from elastichash_spark.tokenize import tokenize_py


@pytest.fixture(scope="module")
def docs(t1):
    return oracle.docs_with_ids(t1).cache()


@pytest.fixture(scope="module")
def brute(t1_pandas):
    """Pure-pandas ground truth: docID, tokens, doclen in pinned order."""
    pdf = t1_pandas.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf["docID"] = range(len(pdf))
    pdf["tokens"] = pdf["text"].map(tokenize_py)
    pdf["doclen"] = pdf["tokens"].map(len)
    return pdf


def test_docids_are_global_rank(docs, brute):
    got = {
        (r["conv_id"], r["turn_idx"]): r["docID"]
        for r in docs.select("conv_id", "turn_idx", "docID").collect()
    }
    for _, row in brute.iterrows():
        assert got[(row["conv_id"], row["turn_idx"])] == row["docID"]


def test_per_turn_text_equality(docs, t1):
    """input_hint invariant: joining docs back to transcripts on
    (conv_id, turn_idx) reproduces text exactly, all rows."""
    joined = docs.alias("d").join(
        t1.alias("s"), ["conv_id", "turn_idx"], "full_outer"
    )
    n_bad = joined.where(
        ~F.col("d.text").eqNullSafe(F.col("s.text"))
    ).count()
    assert n_bad == 0
    assert docs.count() == t1.count()


def test_corpus_stats_match_brute(docs, brute):
    n, avgdl = oracle.corpus_stats(docs)
    assert n == len(brute)
    assert math.isclose(avgdl, brute["doclen"].mean(), rel_tol=1e-12)


def test_df_matches_brute(docs, brute):
    tf = oracle.tf_table(docs)
    got = {r["term"]: r["df"] for r in oracle.term_dict(tf).collect()}
    want = Counter()
    for toks in brute["tokens"]:
        want.update(set(toks))
    assert got == dict(want)


def test_termid_rank_order(docs):
    tdict = oracle.term_dict(oracle.tf_table(docs)).collect()
    ordered = sorted(tdict, key=lambda r: (-r["df"], r["term"]))
    assert [r["termID"] for r in ordered] == list(range(len(tdict)))


def test_duplicate_query_terms_count_once(spark, docs):
    """qid with 'w x x' scores identically to 'w x' (distinct-term semantics)."""
    n, avgdl = oracle.corpus_stats(docs)
    tf = oracle.tf_table(docs)
    tdict = oracle.term_dict(tf)
    q = spark.createDataFrame(
        [(0, "w00001 w00001 the", 10), (1, "w00001 the", 10)], "qid long, text string, k int"
    )
    res = oracle.topk(
        oracle.bm25_scores(tf, tdict, oracle.query_terms(q), n, avgdl), q
    ).collect()
    a = sorted((r["rank"], r["docID"], r["score"]) for r in res if r["qid"] == 0)
    b = sorted((r["rank"], r["docID"], r["score"]) for r in res if r["qid"] == 1)
    assert a == b and len(a) == 10


def test_absent_term_contributes_zero(spark, docs):
    n, avgdl = oracle.corpus_stats(docs)
    tf = oracle.tf_table(docs)
    tdict = oracle.term_dict(tf)
    q = spark.createDataFrame(
        [(0, "w00007 zzabsentzz", 5), (1, "w00007", 5)], "qid long, text string, k int"
    )
    res = oracle.topk(
        oracle.bm25_scores(tf, tdict, oracle.query_terms(q), n, avgdl), q
    ).collect()
    a = sorted((r["rank"], r["docID"], r["score"]) for r in res if r["qid"] == 0)
    b = sorted((r["rank"], r["docID"], r["score"]) for r in res if r["qid"] == 1)
    assert a == b


def test_topk_total_order(spark, docs, t1_queries):
    n, avgdl = oracle.corpus_stats(docs)
    tf = oracle.tf_table(docs)
    tdict = oracle.term_dict(tf)
    out = oracle.topk(
        oracle.bm25_scores(tf, tdict, oracle.query_terms(t1_queries), n, avgdl),
        t1_queries,
    )
    rows = out.orderBy("qid", "rank").collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    ks = {r["qid"]: r["k"] for r in t1_queries.collect()}
    for qid, lst in by_q.items():
        assert len(lst) <= ks[qid]
        for i in range(1, len(lst)):
            prev, cur = lst[i - 1], lst[i]
            assert cur["rank"] == prev["rank"] + 1
            assert (cur["score"] < prev["score"]) or (
                cur["score"] == prev["score"] and cur["docID"] > prev["docID"]
            )
        assert all(r["score"] > 0 for r in lst)


def test_one_query_brute_force_scores(spark, docs, brute):
    """Hand-computed BM25 for one mid-frequency term equals the oracle."""
    n, avgdl = oracle.corpus_stats(docs)
    tf = oracle.tf_table(docs)
    tdict = oracle.term_dict(tf)
    term = "w00005"
    q = spark.createDataFrame([(0, term, 1000)], "qid long, text string, k int")
    res = {
        r["docID"]: r["score"]
        for r in oracle.topk(
            oracle.bm25_scores(tf, tdict, oracle.query_terms(q), n, avgdl), q
        ).collect()
    }
    df_t = sum(1 for toks in brute["tokens"] if term in toks)
    expect = {}
    for _, row in brute.iterrows():
        c = row["tokens"].count(term)
        if c:
            expect[row["docID"]] = scoring.idf(n, df_t) * (
                c / (c + scoring.K1 * (1 - scoring.B + scoring.B * row["doclen"] / avgdl))
            )
    assert set(res) == set(expect)
    for d, s in expect.items():
        assert abs(res[d] - s) < 1e-9


def test_suite_rotation_not_stale():
    """The driver certifies only the first SUITE_CERT['window'] queries()
    keys; assert the committed ordering leaves no entry more than one round
    without a driver-green row (VERDICT r03 item 8)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_suite",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "check_suite.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.check_rotation() == 0
