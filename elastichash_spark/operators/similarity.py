"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring the engine's two-stage design (and the reference's
coarse-filter-then-rerank retrieval, ``/root/reference/README.md:5-8``):

- brute-force cosine top-k — the exact baseline (the ``es-long`` analogue),
  all JVM-side (zip_with + aggregate fold, no UDF, no collect of the corpus)
- multi-band LSH ANN / near-dup — random-hyperplane signatures, OR-amplified
  across bands (candidate ⇔ all planes of SOME band agree), then exact cosine
  rescoring of candidates only. The band union is the OR-of-subcodes
  pigeonhole structure of the reference's MIH prefilter
  (``dh/tools/create_nbs_index.py``): more bands → higher recall, bigger
  candidate sets.

Dot products fold left-to-right over the vector (deterministic float64).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import h60_py


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours for every probe vector: (qid, rank, vec_id, sim_r).

    probes: (qid, vec). The probe side is broadcast (queries << corpus); the
    corpus is scanned once with the similarity computed in whole-stage
    codegen. Self-matches (same id) are excluded by the caller's probe qid
    convention if desired.
    """
    joined = emb.crossJoin(F.broadcast(probes))
    sims = joined.select(
        F.col("qid"),
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col("vec")).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, F.round("sim", 6).alias("sim_r"))
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bits (value-derived,
    engine-portable, no RNG state)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = h60_py(f"{seed}:{p}:{d}")
            row.append((h / float(1 << 60)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit signature as a packed long (JVM exprs only)."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, lit_plane) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def banded_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bands: int,
    planes_per_band: int,
    seed: str = "lsh",
) -> DataFrame:
    """(id, band, sig): one packed signature per band, each band from its own
    independent hyperplane set. Collision in ANY band makes a candidate — the
    OR-amplification that turns per-band recall p^r into 1-(1-p^r)^b.

    Computed in one Arrow-batched matmul per partition (vectors × all bands'
    planes as a single (dim, n_bands·planes) matrix) — the JVM fold-expression
    form costs one codegen'd O(dim) fold per (row, plane) and is ~30× slower
    at 8×4 planes. Sign decisions use the same >= 0 rule; candidate sets are
    decision-identical except for exact-zero-boundary dots, where a
    near-identical pair flips together anyway."""
    import pandas as pd

    all_planes = np.column_stack([
        np.array(hyperplanes(dim, planes_per_band, seed=f"{seed}:band{b}")).T
        for b in range(n_bands)
    ])  # (dim, n_bands * planes_per_band)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            bits = (mat @ all_planes) >= 0.0  # (n, bands*planes)
            sigs = (
                bits.reshape(len(ids), n_bands, planes_per_band) @ weights
            )  # (n, bands) packed longs
            yield pd.DataFrame({
                id_col: np.repeat(ids, n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32), len(ids)),
                "sig": sigs.reshape(-1).astype(np.int64),
            })

    return df.select(id_col, vec_col).mapInPandas(
        kern, f"{id_col} long, band int, sig long"
    )


def ann_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to multi-band LSH
    candidates.

    Stage 1: equi-join on (band, signature) — the terms-lookup analogue,
    OR-ed over ``n_bands`` independent bands (the reference's 4-subcode
    ``should`` clause, ``es_query.7.x.json:60-99``). Stage 2: exact cosine on
    the distinct candidate union only. Recall < 1 by construction; callers
    trade (n_planes, n_bands) for bucket size — measured mAP/recall deltas
    vs :func:`cosine_topk` are asserted in tests (the short-vs-long quality
    table of the reference, slides p.15).
    """
    emb_sig = banded_signatures(emb, id_col, vec_col, dim, n_bands, n_planes)
    probes_sig = banded_signatures(probes, "qid", "vec", dim, n_bands, n_planes)
    cand = (
        emb_sig.join(F.broadcast(probes_sig), ["band", "sig"])
        .select("qid", id_col)
        .distinct()
    )
    joined = (
        cand.join(emb.select(id_col, vec_col), id_col)
        .join(F.broadcast(probes), "qid")
    )
    sims = joined.select(
        "qid", id_col, cosine_sim(F.col(vec_col), F.col("vec")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, F.round("sim", 6).alias("sim_r"))
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from one row (a limit-1 scan, not a collect)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row else 0


def train_ivf(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    n_iters: int = 5,
    seed: str = "ivf",
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids trained on a DETERMINISTIC
    hash-ordered sample on the driver (float64, fixed iteration and
    accumulation order — value-deterministic regardless of partitioning,
    which distributed mean aggregation is not). Training on a bounded sample
    is standard IVF practice (the quantizer needs cluster shape, not every
    row); the corpus-sized work — assignment and search — stays distributed.
    Returns an (n_centroids, dim) float64 matrix."""
    from .hashing import h60_col

    rows = (
        emb.select(id_col, vec_col, h60_col(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", id_col)
        .limit(sample_cap)
        .collect()
    )
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)  # cosine ⇒ spherical k-means
    cents = mat[: min(n_centroids, len(mat))].copy()
    for _ in range(n_iters):
        sims = mat @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — the inverted-file variant of the two-stage
    design (coarse quantizer cells as the recall-oriented filter, exact
    cosine rescoring of the probed cells): assign every corpus vector to its
    nearest spherical-k-means centroid (one Arrow matmul pass), probe the
    ``nprobe`` nearest cells per query, rescore exactly. Approximate by
    construction (like the reference's 64-bit prefilter); recall floors are
    asserted in pytest. At scale the cell assignment is a corpus-linear
    pass and each query touches ~nprobe/n_centroids of the corpus."""
    import pandas as pd

    cents = train_ivf(emb, n_centroids, id_col, vec_col)

    def assign_kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0, 1.0, norms)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": np.argmax(m @ cents.T, axis=1).astype(np.int32),
                }
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign_kern, f"{id_col} long, cell int"
    )
    # probe cells: nprobe nearest centroids per query (probes are tiny)
    probe_rows = probes.collect()
    pairs = []
    for r in probe_rows:
        v = np.array(list(r["vec"]), dtype=np.float64)
        n = np.linalg.norm(v)
        v = v / (n if n > 0 else 1.0)
        order = np.argsort(-(cents @ v))[:nprobe]
        pairs.extend((int(r["qid"]), int(c)) for c in order)
    spark = emb.sparkSession
    probe_cells = spark.createDataFrame(pairs, "qid long, cell int")
    cand = assigned.join(F.broadcast(probe_cells), "cell").select("qid", id_col)
    joined = (
        cand.join(emb.select(id_col, vec_col), id_col)
        .join(F.broadcast(probes), "qid")
    )
    sims = joined.select(
        "qid", id_col, cosine_sim(F.col(vec_col), F.col("vec")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, F.round("sim", 6).alias("sim_r"))
    )


def neardup_candidates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bands: int = 12,
    planes_per_band: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (id_a, id_b), id_a < id_b, from a banded
    self-join on LSH signatures — never all-pairs.

    Parameter calculus (both sides matter at scale):
    - recall: cosine >= 0.999 ⇒ angle <= ~2.6°, per-plane disagreement
      ~0.0142; a true pair misses all 12 bands of 16 planes with
      probability (1 - 0.9858^16)^12 ≈ 6e-9.
    - precision: a RANDOM pair (angle ≈ 90°) collides on a 16-plane band
      with probability ~0.5^16 ≈ 1.5e-5 — few planes per band would flood
      the bucket join with n²-scale false candidates (4 planes = 16 buckets
      melted a 20k-vector corpus into ~10^7 join rows)."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    sigs = banded_signatures(emb, id_col, vec_col, dim, n_bands, planes_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim_r) with
    cosine >= threshold under id_a < id_b — the embedding-space analogue of
    jaccard verification (exact scoring on coarse-filtered candidates).

    Two-stage and fully distributed: multi-band LSH candidates
    (:func:`neardup_candidates` — a banded bucket self-join, no driver
    collect, no O(n^2) stage), then the exact JVM-side cosine fold on the
    candidate pairs only. At 100 TB the heavy operation is the signature
    shuffle (corpus-linear) plus a pair join whose size is the number of
    colliding pairs, which for dedup thresholds is O(duplicates)."""
    cand = neardup_candidates(emb, id_col, vec_col, dim)
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sims = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_sim(F.col("va"), F.col("vb")).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
    return sims.select("id_a", "id_b", F.round("sim", 6).alias("sim_r"))


def neardup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """O(n^2) exact near-dup baseline — TEST ORACLE ONLY.

    One side is collected to the driver and broadcast as a dense float64
    matrix; the other streams through an Arrow kernel in row blocks. Guarded
    by ``max_rows`` because the collect is a deliberate scale ceiling: use
    :func:`neardup_pairs` (LSH candidates + exact verify) in pipelines. The
    accumulation runs dimension-by-dimension in index order, so every
    similarity is bit-identical to the JVM ``F.aggregate`` left fold.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"neardup_pairs_exact is a test oracle capped at {max_rows} rows; "
            "use neardup_pairs for production corpora"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    dim = mat.shape[1] if mat.size else 0
    bn = np.zeros(len(ids), dtype=np.float64)
    for d in range(dim):  # sequential over dims == the fold's float order
        bn += mat[:, d] * mat[:, d]
    bn = np.sqrt(bn)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norm = spark.sparkContext.broadcast(bn)

    def kern(batches):
        bi, bm, bnorm = b_ids.value, b_mat.value, b_norm.value
        for pdf in batches:
            if not len(pdf):
                continue
            ai = pdf[id_col].to_numpy()
            am = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            acc = np.zeros((len(ai), len(bi)), dtype=np.float64)
            na = np.zeros(len(ai), dtype=np.float64)
            for d in range(dim):
                acc += np.outer(am[:, d], bm[:, d])
                na += am[:, d] * am[:, d]
            sims = acc / (np.sqrt(na)[:, None] * bnorm[None, :])
            ii, jj = np.nonzero((sims >= threshold) & (ai[:, None] < bi[None, :]))
            yield pd.DataFrame(
                {"id_a": ai[ii], "id_b": bi[jj], "sim": sims[ii, jj]}
            )

    out = emb.select(id_col, vec_col).mapInPandas(
        kern, "id_a long, id_b long, sim double"
    )
    return out.select("id_a", "id_b", F.round("sim", 6).alias("sim_r"))
