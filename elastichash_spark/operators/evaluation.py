"""Retrieval-quality evaluation: AP@k and mAP — the reference's entire
quality methodology, transposed.

ElasticHash judges its approximate two-stage retrieval against the exact
ranking by mean average precision: per query, relevance of a result is
"shares >= 1 ground-truth label with the query"
(``/root/reference/experiments/get_aps.py:29-31,85-91``), AP@k is sklearn's
``average_precision_score`` over the top-k list
(``get_aps.py:117-123``), and mAP is the per-k mean over all queries
(``get_maps.py:13-27``, the short/twostage/long table of slides p.15).

Here the same three pieces are Spark operators:

- :func:`with_label_relevance` — label-match relevance via two broadcast
  joins against the label table (the GT-database join, ``openimages.py``)
- :func:`ap_at_k` — step-wise AP over distinct score thresholds (exactly
  sklearn's definition: AP = Σ_t (R_t − R_{t−1}) · P_t with cumulative
  precision/recall computed at each distinct score, so tied scores share one
  threshold), per (qid, k); queries with zero relevant results get AP 0
  (``get_aps.py:118`` ``if 1 in gt[:k] else 0``)
- :func:`map_at_k` — mean AP per k

Everything is window/groupBy DataFrame ops — no UDF, no collect; at scale the
only shuffle is by qid, and result lists are top-k-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ap_py(gt: list[int], scores: list[float]) -> float:
    """Pure-Python twin of sklearn.metrics.average_precision_score (the
    reference's ``ap``, ``get_aps.py:6``) — used by tests to pin the Spark
    operator's semantics. Step-wise over distinct thresholds, ties grouped."""
    if not gt or sum(gt) == 0:
        return 0.0
    pairs = sorted(zip(scores, gt), key=lambda x: -x[0])
    pos = sum(gt)
    ap = 0.0
    cn = ctp = 0
    prev_r = 0.0
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            ctp += pairs[j][1]
            cn += 1
            j += 1
        p = ctp / cn
        r = ctp / pos
        ap += (r - prev_r) * p
        prev_r = r
        i = j
    return ap


def with_label_relevance(
    results: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    qid_col: str = "qid",
) -> DataFrame:
    """Attach ``rel`` (0/1) to ranked results: relevant ⇔ the result's label
    equals the query's label (the scalar-label form of the reference's
    label-set intersection, ``get_aps.py:29-31``; with array labels swap the
    equality for ``arrays_overlap``).

    Scale shape: ``labels`` is corpus-sized (one row per indexed vector), so
    it is never broadcast wholesale. Both label lookups are first left-semi
    CUT to the id sets actually present in ``results`` — the result-id set is
    top-k-bounded (≤ Σk rows) and the qid set is the query set — with the
    small id sets broadcast INTO the semi-joins; only the bounded survivors
    are then broadcast into the relevance joins. The plan therefore contains
    no broadcast of an unbounded table (PLANS.md §7).

    LEFT joins: a retrieved result whose id has no label row stays in the
    list with rel=0 — the reference scores every retrieved hit and an
    unlabeled one simply shares no label (``get_aps.py:85-91``); dropping it
    would shrink the precision denominators and inflate AP."""
    rids = results.select(id_col).distinct()
    qids = results.select(qid_col).distinct()
    lc = (
        labels.select(F.col(id_col), F.col(label_col).alias("_rl"))
        .join(F.broadcast(rids), id_col, "left_semi")
    )
    lq = (
        labels.select(F.col(id_col).alias(qid_col), F.col(label_col).alias("_ql"))
        .join(F.broadcast(qids), qid_col, "left_semi")
    )
    return (
        results.join(F.broadcast(lc), id_col, "left")
        .join(F.broadcast(lq), qid_col, "left")
        .withColumn(
            "rel",
            F.when(
                F.col("_rl").isNotNull()
                & F.col("_rl").eqNullSafe(F.col("_ql")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .drop("_rl", "_ql")
    )


def ap_at_k(
    ranked: DataFrame,
    ks: tuple[int, ...] = (5, 10),
    qid_col: str = "qid",
    rank_col: str = "rank",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """(qid, k, ap) for every k in ``ks`` over a ranked relevance-annotated
    result list. Thresholds are distinct scores (ties grouped — integer
    Hamming scores tie heavily, the case that breaks naive rank-wise AP)."""
    trunc = None
    for k in ks:
        t = ranked.where(F.col(rank_col) <= k).select(
            F.lit(int(k)).alias("k"), F.col(qid_col).alias("qid"),
            F.col(score_col).alias("score"), F.col(rel_col).alias("rel"),
        )
        trunc = t if trunc is None else trunc.unionByName(t)
    thr = trunc.groupBy("k", "qid", "score").agg(
        F.count("*").alias("n"), F.sum("rel").alias("tp")
    )
    w = (
        Window.partitionBy("k", "qid")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = thr.withColumn("cn", F.sum("n").over(w)).withColumn(
        "ctp", F.sum("tp").over(w)
    )
    tot = trunc.groupBy("k", "qid").agg(F.sum("rel").alias("pos"))
    wl = Window.partitionBy("k", "qid").orderBy(F.desc("score"))
    terms = (
        cum.join(tot, ["k", "qid"])
        .where(F.col("pos") > 0)
        .withColumn("prev_ctp", F.coalesce(F.lag("ctp").over(wl), F.lit(0)))
        .withColumn(
            "term",
            (
                F.col("ctp").cast("double") / F.col("pos")
                - F.col("prev_ctp").cast("double") / F.col("pos")
            )
            * (F.col("ctp").cast("double") / F.col("cn")),
        )
    )
    ap = terms.groupBy("k", "qid").agg(F.sum("term").alias("ap"))
    # zero-positive queries: AP = 0 (get_aps.py:118)
    return (
        tot.join(ap, ["k", "qid"], "left")
        .select(
            "qid", F.col("k").cast("int").alias("k"),
            F.coalesce(F.col("ap"), F.lit(0.0)).alias("ap"),
        )
    )


def map_at_k(
    ranked: DataFrame,
    ks: tuple[int, ...] = (5, 10),
    qid_col: str = "qid",
    rank_col: str = "rank",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """(k, map): mean AP@k over all queries — ``get_maps.py:13-27``."""
    aps = ap_at_k(ranked, ks, qid_col, rank_col, score_col, rel_col)
    return aps.groupBy("k").agg(F.avg("ap").alias("map"))


def harmonic_dcg_table(max_m: int) -> list[tuple[int, float]]:
    """(m, Σ_{i=1..m} 1/log2(i+1)) for m = 0..max_m — the ideal-DCG
    normalizer for binary relevance. Computed once in Python and embedded
    verbatim in BOTH engines (the same pinned-literal trick as the
    function_score decay rate) so the only cross-engine float divergence in
    NDCG is the final division's last ulp, absorbed by the 6dp round."""
    import math

    out, acc = [(0, 0.0)], 0.0
    for i in range(1, max_m + 1):
        acc += 1.0 / math.log2(i + 1)
        out.append((i, acc))
    return out


def rank_eval(
    ranked: DataFrame,
    total_rel: DataFrame,
    ks: tuple[int, ...] = (5, 10),
    qid_col: str = "qid",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """ES ``_rank_eval`` metric suite over a ranked, relevance-annotated
    result list: per (qid, k) rows with

    - ``prec``  precision@k = relevant retrieved / retrieved (ES divides by
      docs actually retrieved, i.e. min(k, |results|), not k)
    - ``rec``   recall@k = relevant retrieved / ``pos_total`` (ES recall@k's
      denominator is ALL relevant docs in the ratings, here the corpus-wide
      label-match count supplied via ``total_rel``; 0 when pos_total = 0)
    - ``rr``    reciprocal rank = 1/rank of the first relevant hit within
      the top k, 0 if none (ES mean_reciprocal_rank, pre-mean)
    - ``ndcg``  DCG@k / ideal-DCG@k with binary gains — DCG = Σ rel/log2
      (rank+1) (ES's (2^rel − 1) numerator degenerates to rel for 0/1
      gains), IDCG = the harmonic table at m = min(k, pos_total), 0 when
      m = 0 (ES likewise yields 0 for queries with no rated-relevant doc)

    ``total_rel`` is (qid, pos_total). Scale shape: ``ranked`` is
    Σk-bounded; every agg/window partitions by (k, qid); ``total_rel`` is
    query-set-sized and broadcast. The harmonic normalizer is a ≤max(ks)+1
    row literal table, broadcast-joined — no per-row log loop."""
    spark = ranked.sparkSession
    kmax = max(ks)
    hdf = spark.createDataFrame(
        harmonic_dcg_table(kmax), "m int, idcg double")
    trunc = None
    for k in ks:
        t = ranked.where(F.col(rank_col) <= k).select(
            F.lit(int(k)).alias("k"), F.col(qid_col).alias("qid"),
            F.col(rank_col).alias("rnk"), F.col(rel_col).alias("rel"),
        )
        trunc = t if trunc is None else trunc.unionByName(t)
    per = trunc.groupBy("k", "qid").agg(
        F.count("*").alias("n_ret"),
        F.sum("rel").alias("tp"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.sum(
            F.col("rel").cast("double") / F.log2(F.col("rnk") + F.lit(1.0))
        ).alias("dcg"),
    )
    return (
        per.join(
            F.broadcast(total_rel.select(F.col(qid_col).alias("qid"),
                                         "pos_total")),
            "qid",
        )
        .withColumn("m", F.least(F.col("k"), F.col("pos_total")).cast("int"))
        .join(F.broadcast(hdf), "m")
        .select(
            "qid",
            F.col("k").cast("int").alias("k"),
            (F.col("tp").cast("double") / F.col("n_ret")).alias("prec"),
            F.when(F.col("pos_total") > 0,
                   F.col("tp").cast("double") / F.col("pos_total"))
            .otherwise(F.lit(0.0)).alias("rec"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rel").cast("double"), F.lit(0.0)
            ).alias("rr"),
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(F.lit(0.0)).alias("ndcg"),
        )
    )
