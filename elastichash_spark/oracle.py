"""Brute-force exact BM25 — the evaluation oracle (the ``es-long`` analogue).

The reference judges its two-stage retrieval against an exact 256-bit Hamming
index built from the same codes (``/root/reference/experiments/README.md:28-32``,
``generate_long_short.py:58-103``). Here the oracle is exact BM25 computed with
plain DataFrame ops over the corpus — zero custom index structures — and the
engine (index + block-max WAND + rescore) must be rank-identical in top-k
docIDs and equal in scores (FIXTURES.md §4).

Everything is pinned: tokenizer (:mod:`tokenize`), scoring (:mod:`scoring`),
docID = ordinal over (conv_id, turn_idx), termID = ordinal over
(df DESC, term ASC), accumulation in ascending termID order, total order
(score DESC, docID ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .ids import with_ordinal
from .tokenize import tokens_expr, with_term_freqs


def docs_with_ids(
    transcripts: DataFrame, id_cols: list[str] | None = None
) -> DataFrame:
    """Input columns + (docID, doclen, pairs). docID is the deterministic
    global rank over ``id_cols`` (default: the transcript primary key)."""
    toks = with_term_freqs(transcripts, "text")
    return with_ordinal(toks, id_cols or ["conv_id", "turn_idx"], "docID")


def tf_table(docs: DataFrame) -> DataFrame:
    """Exploded (docID, term, tf, doclen) — one row per distinct doc-term."""
    return docs.select(
        "docID",
        "doclen",
        F.explode_outer("pairs").alias("p"),
    ).select(
        "docID", "doclen", F.col("p.term").alias("term"), F.col("p.tf").alias("tf")
    ).where(F.col("term").isNotNull())


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    """N and avgdl (over ALL docs, including doclen=0)."""
    row = docs.agg(
        F.count("*").alias("n"), F.avg(F.col("doclen").cast("double")).alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def term_dict(tf: DataFrame) -> DataFrame:
    """(term, df, termID) with termID = deterministic rank by (df DESC, term ASC).

    Mirrors the reference's value-ordered dense id assignment
    (``experiments/openimages.py:32``) with the scale-safe two-pass ordinal.
    """
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return with_ordinal(dfreq, [("df", "desc"), "term"], "termID")


def query_terms(queries: DataFrame) -> DataFrame:
    """(qid, k, term) with DISTINCT terms per query (duplicates count once —
    mirrors ES ``terms`` semantics, FIXTURES.md §3)."""
    return (
        queries.select("qid", "k", F.explode(tokens_expr(F.col("text"))).alias("term"))
        .dropDuplicates(["qid", "term"])
    )


def bm25_scores(
    tf: DataFrame,
    tdict: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
    boosts: dict[int, dict[str, float]] | None = None,
    min_should_match: int = 1,
) -> DataFrame:
    """Exact per-(qid, docID) BM25 scores (only docs matching >= 1 term).

    Joins query terms (tiny — broadcast) against the tf table, computes the
    per-term contribution JVM-side, then folds contributions in ascending
    termID order via array_sort + aggregate for float64 determinism.

    ``boosts``: optional {qid: {token: multiplier}} — the ES ``term^boost``
    analogue; scales the term's whole contribution (query.search(boosts=...)
    must match this oracle exactly).
    """
    # df=0 query terms drop out here (they contribute 0 by definition)
    qt = tdict.join(F.broadcast(qterms), "term", "inner")
    matches = tf.join(F.broadcast(qt), "term", "inner")
    contrib = matches.withColumn(
        "contrib",
        scoring.contribution_col(F.col("tf"), F.col("doclen"), F.col("df"), n_docs, avgdl),
    )
    if boosts:
        spark = tf.sparkSession
        brows = [
            (int(q), t, float(b)) for q, d in boosts.items() for t, b in d.items()
        ]
        bdf = spark.createDataFrame(brows, "qid long, term string, boost double")
        contrib = (
            contrib.join(F.broadcast(bdf), ["qid", "term"], "left")
            .withColumn(
                "contrib", F.col("contrib") * F.coalesce("boost", F.lit(1.0))
            )
            .drop("boost")
        )
    scores = (
        contrib.groupBy("qid", "docID")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("termID", "contrib"))),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
            F.count(F.lit(1)).alias("nmatch"),  # one contrib row per (qid, term, doc)
        )
    )
    if min_should_match > 1:
        scores = scores.where(F.col("nmatch") >= min_should_match)
    return scores.drop("nmatch")


def topk(scores: DataFrame, queries: DataFrame) -> DataFrame:
    """Top-k per query under the pinned total order (score DESC, docID ASC);
    score-0 docs are never returned (FIXTURES.md §3)."""
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docID"))
    return (
        scores.where(F.col("score") > 0)
        .join(F.broadcast(queries.select("qid", "k")), "qid")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("qid", "rank", "docID", "score")
    )


def oracle_topk(
    transcripts: DataFrame,
    queries: DataFrame,
    id_cols: list[str] | None = None,
    doc_filter: str | None = None,
    boosts: dict[int, dict[str, float]] | None = None,
    min_should_match: int = 1,
) -> DataFrame:
    """End-to-end: corpus + queries -> (qid, rank, docID, score).

    ``doc_filter``: optional predicate over the corpus columns (+ doclen),
    mirroring ``search(doc_filter=...)``'s ES filter-context semantics —
    scores use CORPUS-WIDE statistics, the filter only restricts which docs
    may appear in the result."""
    docs = docs_with_ids(transcripts, id_cols)
    tf = tf_table(docs)
    n_docs, avgdl = corpus_stats(docs)
    tdict = term_dict(tf)
    qterms = query_terms(queries)
    scores = bm25_scores(tf, tdict, qterms, n_docs, avgdl, boosts=boosts,
                         min_should_match=min_should_match)
    if doc_filter is not None:
        scores = scores.join(
            docs.where(doc_filter).select("docID"), "docID", "left_semi"
        )
    return topk(scores, queries)
