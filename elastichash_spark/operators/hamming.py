"""Two-stage Hamming search over binarized codes — the reference's literal
retrieval operator, re-expressed Spark-first.

ElasticHash maps each image to a binary code, splits the short code into four
16-bit subcodes f0..f3 (multi-index hashing), prefilters candidates via a
``terms`` lookup of each subcode's Hamming-ball-≤2 neighbor set
(``/root/reference/dh/tools/create_nbs_index.py:37-62``,
``dh/app/templates/es_query.7.x.json:56-103``), then reranks survivors with
the exact score ``Σ_i (bits − popcount(q_i XOR doc_i))``
(``dh/tools/add_hdist.py:18-22``).

Here the code source is the embeddings table: bit j of subcode i is
``embedding[16·i + j] > 0`` (the reference's binarize,
``dh/app/util.py:16-24``). Everything stays JVM-side:

- subcode packing: ``bit_count``-free shift/OR column exprs (codegen'd)
- stage 1: the neighbor expansion is computed per QUERY subcode (4×137
  values, ``nbs_masks``) and broadcast — Spark's broadcast semi-join replaces
  the reference's precomputed 65,536-doc ``nbs`` index, which ES only needed
  because a terms-lookup must resolve against an index. No per-doc neighbor
  materialization, same pigeonhole recall guarantee (any doc within 64-bit
  Hamming distance ≤ 11 of the query survives; slides p.7-8).
- stage 2: exact score ``64 − Σ_i bit_count(f_i XOR q_i)`` as a native
  column expression (the ``hd64`` Painless script analogue), top-k under the
  pinned total order (score DESC, id ASC).

At cluster scale the corpus side is a parquet scan with the 4 subcode
columns projected; the probe side (queries × 137 neighbors × 4 subcodes) is
broadcast, so stage 1 is a shuffle-free broadcast join.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SUBCODE_BITS = 16
NUM_SUBCODES = 4


def nbs_masks(bits: int = SUBCODE_BITS, d: int = 2) -> list[int]:
    """All XOR masks of Hamming weight ≤ d over ``bits`` positions — the
    reference's neighbor-mask enumeration (create_nbs_index.py:37-52).
    For bits=16, d=2: 1 + 16 + 120 = 137 masks."""
    masks = [0]
    for r in range(1, d + 1):
        for pos in combinations(range(bits), r):
            m = 0
            for p in pos:
                m |= 1 << p
            masks.append(m)
    return masks


def subcode_expr(vec_col: Column, sub: int, bits: int = SUBCODE_BITS) -> Column:
    """Pack dims [bits·sub, bits·sub+bits) of an array<float> into an int
    subcode: bit j set iff element > 0 (binarize, util.py:16-24). LSB = first
    dim of the slice; element_at is 1-based."""
    out = F.lit(0)
    for j in range(bits):
        bit = F.when(
            F.element_at(vec_col, bits * sub + j + 1) > F.lit(0.0), F.lit(1 << j)
        ).otherwise(F.lit(0))
        out = out.bitwiseOR(bit)
    return out


def with_subcodes(
    emb: DataFrame, vec_col: str = "embedding", bits: int = SUBCODE_BITS
) -> DataFrame:
    """Add f0..f3 subcode columns (the retrieval-index mapping's keyword
    fields, import_csv.py:36-39)."""
    out = emb
    for i in range(NUM_SUBCODES):
        out = out.withColumn(f"f{i}", subcode_expr(F.col(vec_col), i, bits))
    return out


def _score_expr(probe_prefix: str = "q") -> Column:
    """64 − Σ_i popcount(f_i XOR q_i) — the hd64 score (add_hdist.py:18-22)
    summed over subcodes (score_mode: sum, es_query.7.x.json:3-5)."""
    s = F.lit(NUM_SUBCODES * SUBCODE_BITS)
    for i in range(NUM_SUBCODES):
        s = s - F.bit_count(
            F.col(f"f{i}").bitwiseXOR(F.col(f"{probe_prefix}{i}")).cast("long")
        )
    return s


def _probe_subcodes(probes: DataFrame) -> DataFrame:
    """(qid, q0..q3) from (qid, vec)."""
    out = probes
    for i in range(NUM_SUBCODES):
        out = out.withColumn(f"q{i}", subcode_expr(F.col("vec"), i))
    return out.drop("vec")


def hamming_topk(
    emb: DataFrame, probes: DataFrame, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact brute-force Hamming top-k (the ``es-long`` method analogue,
    import_csv.py:67-98): score every doc, no prefilter."""
    docs = with_subcodes(emb).select(id_col, "f0", "f1", "f2", "f3")
    q = _probe_subcodes(probes)
    scored = docs.crossJoin(F.broadcast(q)).select(
        "qid", id_col, _score_expr().alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, F.col("score").cast("long").alias("score"))
    )


def hamming_twostage(
    emb: DataFrame, probes: DataFrame, k: int = 10, d: int = 2, id_col: str = "vec_id"
) -> DataFrame:
    """Two-stage: MIH neighbor prefilter, then exact rerank of survivors.

    Candidate ⇔ ∃ subcode i with popcount(f_i XOR q_i) ≤ d — implemented, as
    in the reference, by set membership of f_i in the query's expanded
    neighbor list (q_i XOR mask), OR-ed across the 4 subcodes
    (bool should / minimum_should_match:1, es_query.7.x.json:60-99).

    The reference needs a precomputed 137-value neighbor expansion only
    because Lucene cannot popcount — a ``terms`` lookup is the sole way to
    express a Hamming ball there (``create_nbs_index.py:37-62``). Spark CAN:
    ``bit_count(f_i XOR q_i) <= d`` is the same ball membership as one cheap
    codegen'd expression (tests assert predicate ⇔ neighbor-set membership,
    ``nbs_masks`` kept as the parity enumeration). The whole operator is
    therefore ONE job: scan the corpus once, BroadcastNestedLoopJoin the
    (tiny) probe subcode table, keep (doc, query) pairs inside the ball —
    stage 1 — and rerank survivors with the exact hd64 score — stage 2. No
    driver collect, no doc-side melt, no shuffle before the final top-k
    window; per scanned row the filter costs n_queries × 4 bit_counts."""
    q = _probe_subcodes(probes)
    docs = with_subcodes(emb).select(id_col, "f0", "f1", "f2", "f3")
    member = None
    for i in range(NUM_SUBCODES):
        p = (
            F.bit_count(
                F.col(f"f{i}").bitwiseXOR(F.col(f"q{i}")).cast("long")
            )
            <= d
        )
        member = p if member is None else (member | p)
    cand = docs.crossJoin(F.broadcast(q)).where(member)
    # stage 2: exact rerank of candidates only (hd64 analogue)
    scored = cand.select("qid", id_col, _score_expr().alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, F.col("score").cast("long").alias("score"))
    )
