"""Deduplication operators for web-scale corpora.

Four escalating strategies, all expressed as shuffles Catalyst can plan
(groupBy / self-join on candidate keys), never pairwise-all-pairs:

- exact: hash-groupBy on a normalized-text fingerprint
- MinHash + LSH: shingle -> per-permutation min-hash -> banded bucket join
- SimHash: 60-bit weighted bit-majority signature (near-dup by few-bit diff)
- n-gram Jaccard: verified similarity on LSH/shingle candidate pairs

The two-stage structure intentionally mirrors the retrieval engine (and the
reference's coarse-filter-then-exact-rerank design): LSH banding is the
recall-oriented cheap filter, Jaccard verification is the exact rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_expr
from .hashing import h60_col


def normalized_text(text: Column) -> Column:
    """Canonical form for exact dedup: tokenize + single-space rejoin."""
    return F.array_join(tokens_expr(text), " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, keeper, n_docs): md5 of normalized text, keeper = min id.

    One hash-groupBy; at 100 TB this is a single shuffle on a high-cardinality
    key with no skew (fingerprints are uniform), and map-side partial
    aggregation keeps the shuffle small.
    """
    return (
        docs.select(
            F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_docs"))
    )


def shingles(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = docs.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("toks"))
    idx = F.sequence(F.lit(0), F.size("toks") - F.lit(n))
    sh = toks.where(F.size("toks") >= n).select(
        id_col,
        F.explode(idx).alias("i"),
        F.col("toks"),
    ).select(
        id_col,
        F.array_join(F.slice("toks", F.col("i") + 1, n), " ").alias("shingle"),
    )
    return sh.dropDuplicates([id_col, "shingle"])


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", n_perms: int = 8
) -> DataFrame:
    """(id, perm, minh): per-permutation min over md5(perm || shingle).

    Permutations are realized as salted md5 re-hashes (portable to any engine)
    rather than affine transforms (which overflow int64).
    """
    perms = F.explode(F.array(*[F.lit(p) for p in range(n_perms)])).alias("perm")
    salted = sh.select(id_col, F.col("shingle"), perms)
    return (
        salted.withColumn(
            "h", h60_col(F.concat(F.col("perm").cast("string"), F.lit("#"), F.col("shingle")))
        )
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("minh"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", band_size: int = 2
) -> DataFrame:
    """Banded LSH join: docs sharing one full band of minhashes -> (id_a, id_b).

    The band key groupBy + self-join touches only docs that collide — the
    scale path that avoids O(n^2) comparisons entirely. The key is the 60-bit
    md5 hash of the band signature string, NOT the string itself: shuffle keys
    are 8 bytes instead of the 25-40-byte concatenation (band_size x int64
    rendered in decimal), which at 100 TB is the dominant shuffle payload of
    this stage. A 60-bit collision across different signatures would add a
    spurious candidate pair — candidates are verified by exact Jaccard
    downstream (jaccard_verify), so a collision costs one wasted verification,
    never a wrong result.
    """
    banded = (
        sigs.withColumn("band", (F.col("perm") / F.lit(band_size)).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.array_sort(F.collect_list(F.struct("perm", "minh"))).alias("sig"))
        .withColumn(
            "band_key",
            h60_col(
                F.concat_ws(
                    ":",
                    F.col("band").cast("string"),
                    F.array_join(
                        F.transform("sig", lambda s: s["minh"].cast("string")), ","
                    ),
                )
            ),
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_key")
    return (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    restrict_to: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over docs sharing >= 1 shingle: the verification
    stage. (id_a, id_b, jaccard_r rounded to 6dp).

    Intersections come from a self-equi-join on shingle; sizes from a
    groupBy; the union size by inclusion-exclusion. The join is skew-prone on
    stop shingles (a shingle shared by m docs emits m^2/2 join rows) —
    ``max_df`` drops shingles with document frequency above the ceiling from
    CANDIDATE GENERATION ONLY (sizes still count them, so the jaccard of a
    surviving pair shifts only by the dropped intersections; pairs whose
    overlap is exclusively stop-shingles are treated as noise, which is the
    point of a df ceiling). For the exactly-verified scale path, use
    :func:`jaccard_verify` on LSH candidates instead.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    join_sh = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("shingle_df"))
            .where(F.col("shingle_df") <= max_df)
            .select("shingle")
        )
        join_sh = sh.join(rare, "shingle", "left_semi")
    a = join_sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = join_sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    if restrict_to is not None:
        inter = inter.join(restrict_to, ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def jaccard_verify(
    sh: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs — the scale path.

    ``candidates``: (id_a, id_b) from :func:`lsh_candidate_pairs`. Each doc's
    distinct shingles are packed once into a sorted array (corpus-linear
    groupBy, no skew: the key is the doc id); the intersection is then
    ``array_intersect`` on the candidate pair join — work is
    O(|candidates| · doc size), never O(shingle_df^2). This mirrors the
    engine's exact-rerank-of-survivors stage: no self-join on shingle exists
    anywhere in the plan, so a stop shingle shared by a million docs costs
    nothing beyond its LSH signature contribution.
    """
    sets = sh.groupBy(id_col).agg(
        F.array_sort(F.collect_set("shingle")).alias("shset")
    )
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("shset").alias("set_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("shset").alias("set_b"))
    jac = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("set_a") + F.size("set_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return jac.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Duplicate-group assignment: (id, cluster) where cluster is the MIN id
    reachable through the pair graph — the step a dedup pipeline runs after
    pair generation to pick one keeper per group (transitively: if A~B and
    B~C, all three dedup together even though A~C was never emitted).

    Alternating large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14): each round rewires every node's
    strictly-larger neighbours (large-star) / its smaller neighbours
    (small-star) to the minimum of its closed neighbourhood. Converges in
    O(log^2 n) rounds REGARDLESS of graph diameter (a path graph converges
    just as fast as a clique — the long-chain crawl-dedup case that kills
    diameter-bounded label propagation), to a star forest rooted at each
    component's minimum id. Each half-round is one groupBy + one join on the
    edge list, every key the node id (no skew beyond true supernodes, which
    the star rewiring itself collapses). Lineage is cut per round
    (localCheckpoint) and each superseded checkpoint is unpersisted as soon
    as its successor is materialized, so executor storage holds at most two
    edge-set copies at any time. ``max_iters`` is a loud guard far above the
    log^2 bound; non-convergence raises rather than returning partial
    clusters."""
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # canonical directed form: u > v, deduped — the state both phases rewrite
    edges = (
        e.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if edges.limit(1).count() == 0:
        return edges.select(F.col("u").alias("id"), F.col("v").alias("cluster"))
    for _ in range(max_iters):
        # ---- large-star: for every node n, attach each strictly larger
        # neighbour w to m = min(neighbourhood(n) ∪ {n}). Work on the
        # symmetric view; only w > n edges are (re-)emitted, so every
        # output pair is already directed u > v.
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # ---- small-star: edges already point large -> small, so each
        # node u's smaller neighbourhood is exactly its out-edges; attach
        # every smaller neighbour AND u itself to m = min(out(u)).
        smins = ls.groupBy("u").agg(F.min("v").alias("m"))
        new_edges = (
            ls.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        ls.unpersist()
        # converged iff the canonical edge set is unchanged (set
        # semantics: both sides are distinct, so subtract is exact)
        changed = new_edges.subtract(edges).count()
        edges.unpersist()
        edges = new_edges
        if changed == 0:
            # star forest: u -> root(v); roots label themselves. The labels
            # are checkpointed so the final edge checkpoint can be released
            # before returning (one bounded label-set copy survives — the
            # caller's result — not one copy per round).
            labels = (
                edges.select(F.col("u").alias("id"), F.col("v").alias("cluster"))
                .unionByName(
                    edges.select(
                        F.col("v").alias("id"), F.col("v").alias("cluster")
                    )
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} "
        "large-star/small-star rounds — pathological input (cycle in the "
        "canonical order is impossible; investigate before retrying)"
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 60) -> DataFrame:
    """(id, simhash): weighted bit-majority signature over term hashes.

    60 bits so the packed value is portable signed int64 everywhere. tf-
    weighted: bit b of h60(term) votes +tf / -tf; sign of the tally sets the
    output bit. All JVM-side exprs (explode over bit positions) — no UDF.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("h", h60_col(F.col("term")))
    b = F.explode(F.array(*[F.lit(i) for i in range(bits)])).alias("b")
    votes = tf.select(id_col, "h", "tf", b).withColumn(
        "vote",
        F.when(F.expr("(h >> b) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
    )
    tally = votes.groupBy(id_col, "b").agg(F.sum("vote").alias("t"))
    return (
        tally.withColumn(
            "bitval",
            F.when(F.col("t") >= 0, F.expr("CAST(1 AS BIGINT) << b")).otherwise(F.lit(0).cast("long")),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )
