"""Binary-code statistics: per-bit counts and bit-correlation matrix.

Transposes the reference's model-preparation analytics
(``/root/reference/model/prepare_model/correlations.py:74-78`` counts of
1s/0s per bit position; ``:88-107`` Pearson correlation matrix between bit
positions, emitted as lower-triangle ``(x, y, 1-|corr|)`` edge weights — the
input to the decorrelation graph that picks the 64 short-code bits,
``decorrelate.py:88-103``).

Spark-first: bits come from binarizing the embedding column (element > 0,
``dh/app/util.py:16-24``); counts are one explode + groupBy; the pairwise
co-occurrence matrix comes from exploding each row's SET-bit positions and
pair-joining within the row — at most C(bits,2) aggregation keys, so the
shuffle reduces to a constant-size table regardless of corpus size
(map-side partial aggregation does the heavy lifting). Pearson correlation
of 0/1 variables needs only (n, c_i, c_j, c_ij), all integer sums:
corr = (n·c_ij − c_i·c_j) / sqrt((n·c_i − c_i²)(n·c_j − c_j²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bit_counts(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 64
) -> DataFrame:
    """(bit, ones, zeros): how often each bit position binarizes to 1/0 —
    ``correlations.py:74-78``."""
    b = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    rows = emb.select(F.col(vec_col).alias("v")).select("v", b)
    return (
        rows.groupBy("bit")
        .agg(
            F.sum(
                F.when(F.element_at("v", F.col("bit") + 1) > 0, 1).otherwise(0)
            ).alias("ones"),
            F.sum(
                F.when(F.element_at("v", F.col("bit") + 1) > 0, 0).otherwise(1)
            ).alias("zeros"),
        )
        .select(F.col("bit").cast("int"), F.col("ones").cast("long"), F.col("zeros").cast("long"))
    )


def subcode_edge_weights(
    emb: DataFrame,
    vec_col: str = "embedding",
    bits: int = 16,
    group_size: int = 4,
    assignment: dict[int, int] | None = None,
) -> DataFrame:
    """(grp, n_edges, weight_u): per-subcode sum of internal decorrelation
    edge weights — the quantity the reference reports per subcode after
    partitioning (``decorrelate.py:11-12`` ``G.size(weight='weight')``).
    Default assignment is the contiguous layout (bit // group_size, the
    reference's slice-based subcode layout, ``decorrelate.py:94-97``); pass
    ``assignment`` (bit -> group) to weigh a computed partition.

    ``weight_u`` is the weight sum in exact 1e-6 units (BIGINT): each edge
    weight is already rounded to 6 decimals, so scaling to integers makes
    the aggregate independent of float summation order — a double sum
    differs in the last ULP across partition orders and flips a final
    decimal rounding when the true sum sits on the boundary (observed:
    5.564725 rounding to .56472/.56473 across runs)."""
    corr = bit_correlations(emb, vec_col, bits)
    if assignment is None:
        gx = (F.col("bit_x") / group_size).cast("int")
        gy = (F.col("bit_y") / group_size).cast("int")
    else:
        m = F.create_map(*[F.lit(x) for kv in assignment.items() for x in kv])
        gx, gy = m[F.col("bit_x")], m[F.col("bit_y")]
    return (
        corr.withColumn("gx", gx)
        .withColumn("gy", gy)
        .where(F.col("gx") == F.col("gy"))
        .groupBy(F.col("gx").alias("grp"))
        .agg(
            F.count("*").alias("n_edges"),
            F.sum(F.round(F.col("w_r") * 1e6).cast("long")).alias("weight_u"),
        )
    )


def permute_bits(
    emb: DataFrame,
    permutation: list[int],
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Apply a bit/dimension permutation to a code column: output position i
    takes input position ``permutation[i]`` — the distributed form of the
    reference's ``permute_code`` (``experiments/util.py:77-78``), which
    gathers bitstring characters by index. Here the gather is a single
    codegen'd array constructor over ``element_at`` lookups (no UDF, no
    shuffle — pure per-row projection, so it fuses into whatever scan or
    join surrounds it). Works on any array column; binarization downstream
    (subcode_expr) then sees the permuted layout."""
    n = len(permutation)
    if sorted(permutation) != list(range(n)):
        raise ValueError("permutation must be a bijection over range(n)")
    arr = F.array(
        *[F.element_at(F.col(vec_col), int(p) + 1) for p in permutation]
    )
    return emb.withColumn(out_col or vec_col, arr)


def assignment_permutation(groups: list[list[int]]) -> list[int]:
    """Flatten a :func:`partition_bits` grouping into a gather permutation:
    group g's bits land contiguously at output positions
    [g·len(group), (g+1)·len(group)) — so ``permute_bits`` + the contiguous
    subcode layout realizes the computed decorrelation partition (the step
    ``decorrelate.py:94-97`` performs by slicing the reordered bit list)."""
    return [b for g in groups for b in g]


def reorder_permutation(
    weights: list[float], group_size: int, order: str = "desc"
) -> list[int]:
    """The reference's ``reorder_code`` (``experiments/util.py:80-96``) as a
    permutation: subcodes sorted by weight (descending by default — most
    informative first, the impact-ordered processing idea), bits within a
    subcode untouched. ``permutation[i] = order[i // gs]·gs + i % gs``,
    exactly the reference's index arithmetic INCLUDING its tie behavior
    (``sorted(zip(weights, range(n)), reverse=...)`` tie-breaks on the
    subcode index through the tuple compare)."""
    pairs = sorted(zip(weights, range(len(weights))), reverse=(order == "desc"))
    idx = [g for _w, g in pairs]
    return [g * group_size + j for g in idx for j in range(group_size)]


def partition_bits(
    edges: list[tuple[int, int, float]], bits: int, group_size: int
) -> list[list[int]]:
    """Deterministic greedy decorrelation partition: split ``bits`` positions
    into groups of ``group_size`` MAXIMIZING internal 1−|corr| edge weight —
    i.e. each subcode holds mutually decorrelated bits. This is what the
    reference's recursive Kernighan-Lin bisection computes (KL minimizes the
    cut of the 1−|corr| graph, ``decorrelate.py:9-22``, equivalently
    maximizes internal weight; its graph is likewise tiny — bits² edges —
    and partitioned on the driver). Greedy with a deterministic tie-break
    instead of networkx KL: bits in descending total-weight order each join
    the non-full group gaining the most internal weight, then a full pass of
    best-improvement swaps refines."""
    if group_size <= 0 or bits % group_size != 0:
        raise ValueError(
            f"bits ({bits}) must be divisible by group_size ({group_size})"
        )
    w = {}
    for a, b, wt in edges:
        w[(min(a, b), max(a, b))] = w.get((min(a, b), max(a, b)), 0.0) + wt

    def pair_w(a: int, b: int) -> float:
        return w.get((min(a, b), max(a, b)), 0.0)

    total = {i: 0.0 for i in range(bits)}
    for (a, b), wt in w.items():
        if a < bits and b < bits:
            total[a] += wt
            total[b] += wt
    n_groups = bits // group_size
    groups: list[list[int]] = [[] for _ in range(n_groups)]
    for i in sorted(range(bits), key=lambda i: (-total[i], i)):
        best, best_gain = None, None
        for g in range(n_groups):
            if len(groups[g]) >= group_size:
                continue
            gain = sum(pair_w(i, j) for j in groups[g])
            if best_gain is None or gain > best_gain:
                best, best_gain = g, gain
        groups[best].append(i)
    # refinement passes: swap any cross-group pair that raises total
    # internal weight (deterministic scan order)
    def internal(g: list[int]) -> float:
        return sum(pair_w(a, b) for ai, a in enumerate(g) for b in g[ai + 1:])

    improved = True
    while improved:
        improved = False
        for ga in range(n_groups):
            for gb in range(ga + 1, n_groups):
                for ia in range(group_size):
                    for ib in range(group_size):
                        a, b = groups[ga][ia], groups[gb][ib]
                        before = internal(groups[ga]) + internal(groups[gb])
                        groups[ga][ia], groups[gb][ib] = b, a
                        after = internal(groups[ga]) + internal(groups[gb])
                        if after > before + 1e-12:
                            improved = True
                        else:
                            groups[ga][ia], groups[gb][ib] = a, b
    return [sorted(g) for g in groups]


def bit_correlations(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 16
) -> DataFrame:
    """(bit_x, bit_y, w_r): lower-triangle (bit_x > bit_y) decorrelation
    weights 1 − |corr| for bit pairs with nonzero correlation — byte-for-byte
    the quantity ``correlations.py:103-107`` writes for the decorrelation
    graph. Degenerate bits (always 0 / always 1) have undefined correlation
    and are skipped, as are exactly-uncorrelated pairs (the reference's
    ``c > 0`` filter)."""
    n = emb.count()
    setbits = emb.select(
        F.filter(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda b: F.element_at(F.col(vec_col), b + 1) > 0,
        ).alias("pos")
    )
    singles = setbits.select(F.explode("pos").alias("i")).groupBy("i").agg(
        F.count("*").alias("ci")
    )
    cofire = (
        setbits.select(F.explode("pos").alias("i"), "pos")
        .select("i", F.explode("pos").alias("j"))
        .where(F.col("j") > F.col("i"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("cij"))
    )
    ci = singles.select(F.col("i"), F.col("ci"))
    cj = singles.select(F.col("i").alias("j"), F.col("ci").alias("cj"))
    # the pair grid comes from the bits that fire at least once (a tiny cross
    # of the C(bits,2) kind), NOT from co-occurrence: two bits that each fire
    # but never together are negatively correlated, and corrcoef counts them
    pairs = (
        ci.crossJoin(cj)
        .where(F.col("j") > F.col("i"))
        .join(cofire, ["i", "j"], "left")
        .withColumn("cij", F.coalesce(F.col("cij"), F.lit(0)))
    )
    # bits that never fire were dropped by the grid; the always-one
    # degenerate case (ci == n) zeroes the denominator -> filtered
    num = F.col("cij").cast("double") * n - F.col("ci").cast("double") * F.col("cj")
    den = F.sqrt(
        (F.col("ci").cast("double") * n - F.col("ci").cast("double") * F.col("ci"))
        * (F.col("cj").cast("double") * n - F.col("cj").cast("double") * F.col("cj"))
    )
    out = (
        pairs.withColumn("den", den)
        .where(F.col("den") > 0)
        .withColumn("corr", num / F.col("den"))
        .where(F.abs("corr") > 0)
        # reference emits tril: x = the larger index, y = the smaller
        .select(
            F.col("j").cast("int").alias("bit_x"),
            F.col("i").cast("int").alias("bit_y"),
            F.round(F.lit(1.0) - F.abs("corr"), 6).alias("w_r"),
        )
    )
    return out
