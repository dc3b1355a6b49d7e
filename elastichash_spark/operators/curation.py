"""Training-data curation operators: benchmark decontamination, Gopher-style
repetition statistics, PII redaction, and stratified mixture sampling.

These are the corpus-hygiene passes a 100 TB pretraining pipeline runs
between dedup and tokenization. Everything is pure JVM column expressions or
one well-shaped shuffle — no Python on the data path — and every operator
has an exact ANSI-SQL twin for oracle checking.

Scale shapes:
- decontaminate: benchmark sets are small (10^3-10^5 docs), so their shingle
  set broadcasts; the corpus side is one scan + one map-side-combined
  aggregate. No corpus-sized shuffle.
- repetition_stats: explode + two-level aggregate; shuffle key is
  (doc_id, gram) — high cardinality, uniform, partial aggregation applies.
- pii_redact / stratified_sample: stateless row-local exprs, whole-stage
  codegen, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_expr
from .dedup import shingles
from .hashing import h60_col

# regex dialect restricted to what Java regex and RE2 (DuckDB) evaluate
# identically: character classes, bounded repetition, no backrefs/lookaround
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: int = 1,
) -> DataFrame:
    """Benchmark-overlap detection: (id, n_hit_ngrams, contaminated).

    A training doc is contaminated when >= ``threshold`` of its distinct
    word ``n``-grams appear anywhere in the evaluation set — the standard
    n-gram decontamination rule (GPT-3 appendix C uses 13-grams; ``n`` is a
    parameter because the right value scales with document length).

    Scale shape: the eval side collapses to DISTINCT shingle hashes —
    benchmark-sized, not corpus-sized — and is explicitly broadcast, so the
    corpus side is ONE scan whose shingle explosion feeds a map-side-combined
    count; no shuffle of corpus shingles. Joining on the 60-bit shingle hash
    keeps the broadcast table 8 bytes/row; a hash collision can only add a
    false n-gram hit (never hide one), acceptable for a screening pass.
    Docs with no overlap are kept with n_hit_ngrams = 0 (the common case at
    scale — the output is a per-doc verdict, not just the hit list).
    """
    corpus_sh = shingles(docs, id_col, text_col, n=n).select(
        id_col, h60_col(F.col("shingle")).alias("sh")
    )
    eval_sh = (
        shingles(eval_docs, id_col, text_col, n=n)
        .select(h60_col(F.col("shingle")).alias("sh"))
        .distinct()
    )
    hits = (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("long").alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) >= threshold).alias("contaminated"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features: (id, n_tokens, dup_unigram_frac_r,
    top_bigram_frac_r) — the fraction of token occurrences that are repeats
    of an already-seen token, and the share of bigram occurrences taken by
    the single most frequent bigram (rounded 6dp; 0.0 when the doc is too
    short to form the gram). High values flag boilerplate/spam for the
    quality filter (Gopher rules C4-C11 analogue).

    Scale shape: one explode + groupBy(doc, gram) with map-side partial
    aggregation, then a per-doc rollup — shuffle keys are high-cardinality
    and uniform; no windows, no collects.
    """
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    )
    uni = (
        toks.select(id_col, F.explode("toks").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
        )
    )
    bi_idx = F.sequence(F.lit(1), F.size("toks") - F.lit(1))
    bi = (
        toks.where(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(bi_idx).alias("i"),
            F.col("toks"),
        )
        .select(
            id_col,
            F.concat_ws(
                " ", F.element_at("toks", F.col("i")),
                F.element_at("toks", F.col("i") + 1),
            ).alias("g"),
        )
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bi"))
    )
    return (
        docs.select(id_col)
        .join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) > 0,
                    (F.col("n_tokens") - F.col("n_distinct"))
                    / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_unigram_frac_r"),
            F.round(
                F.when(
                    F.coalesce("n_bi", F.lit(0)) > 0,
                    F.col("top_c") / F.col("n_bi").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac_r"),
        )
    )


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub: (id, clean_text, n_emails, n_phones) — emails then
    NNN-NNN-NNNN / NNN.NNN.NNNN phone numbers replaced with typed
    placeholders, with per-doc counts for the curation report. Stateless
    row-local regexp exprs (whole-stage codegen, zero shuffle); the regex
    dialect is pinned to the Java-regex/RE2 intersection so the DuckDB
    oracle evaluates the identical patterns. Emails are matched
    CASE-INSENSITIVELY (``(?i)`` — both dialects) but replacement runs on
    the ORIGINAL-case text: clean_text is the document verbatim apart from
    the redacted spans, because this output feeds pretraining and a baked-in
    lowercasing would be a lossy transform smuggled into a privacy pass.
    Redaction order is emails first so an email containing a phone-shaped
    digit run is counted once, as an email.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    email_i = "(?i)" + EMAIL_RE
    n_emails = F.size(F.regexp_extract_all(text, F.lit(email_i), F.lit(0)))
    no_email = F.regexp_replace(text, email_i, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling — the domain-mixture step of a
    pretraining data recipe: keep a row iff h60(text) mod ``denom`` falls
    under its stratum's rate. Groups absent from ``rates`` drop entirely
    (rate 0).

    Rerun-stable (pure function of content, no RNG state), composable with
    incremental ingestion (a doc's verdict never changes as the corpus
    grows), and zero-shuffle: the rate table enters the plan as a literal
    CASE/map lookup, so the whole operator is a codegen'd filter pushed at
    the scan. For rate tables too large for a plan literal (thousands of
    strata), swap the map for a broadcast join — same semantics.
    """
    if not rates:
        raise ValueError("rates must map at least one stratum to a rate")
    for g, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for stratum {g!r} must be in [0, 1] (got {r})")
    rate_map = F.create_map(
        *[x for g, r in sorted(rates.items()) for x in (F.lit(g), F.lit(float(r)))]
    )
    cutoff = (rate_map[F.col(key_col)] * denom).cast("long")
    return docs.where(
        (h60_col(F.col(text_col)) % denom) < F.coalesce(cutoff, F.lit(0))
    ).select(id_col, key_col)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_groups: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing — the concatenate-then-chunk step between
    curation and tokenized training shards: documents are laid end-to-end
    in a deterministic order and cut into fixed ``budget``-token training
    sequences, documents spanning a cut boundary split across sequences
    (standard causal-LM packing; no padding waste).

    Output per doc: (id, group, start_tok, n_tokens, seq_id, n_seqs) where
    ``start_tok`` is the doc's offset in its group's token stream,
    ``seq_id = start_tok // budget`` the first training sequence it lands
    in, and ``n_seqs`` how many sequences it spans (0-token docs report
    n_seqs = 0 — they contribute nothing to any sequence).

    Scale shape: one shuffle keyed by ``group = id mod n_groups`` with an
    in-partition running sum — each group's window is independent, so
    parallelism is ``n_groups`` (size it to ~10-100x the cluster's cores;
    packing is only sequential WITHIN a group, which is exactly the unit a
    training shard wants anyway). No driver-side state, rerun-stable.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1 (got {budget})")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1 (got {n_groups})")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(int(n_groups))).cast("long").alias("group"),
        F.size(tokens_expr(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        toks.withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("seq_id", F.floor(F.col("start_tok") / budget))
        .withColumn(
            "n_seqs",
            F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
                F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / budget)
                - F.col("seq_id") + 1
            ),
        )
        .select(id_col, "group", "start_tok", "n_tokens", "seq_id", "n_seqs")
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RefinedWeb-style duplicated-n-gram coverage: per doc, the fraction of
    token POSITIONS covered by at least one ``n``-gram that occurs two or
    more times within the document (Penedo et al. 2023 §"repetitious
    content", the dup_{n}gram character-fraction family, computed here on
    token positions). Complements :func:`repetition_stats`: top-gram share
    catches one dominant loop; coverage catches diffuse boilerplate where
    MANY different grams each repeat a little. Docs with fewer than ``n``
    tokens score 0.0.

    Output: (id, n_tokens, dup_ngram_frac_r), frac rounded 6dp.

    Scale shape: explode n-gram starts (n rows per token, bounded), one
    (id, gram) groupBy with map-side partial aggregation, a left-semi join
    back on the same keys (shuffle reuse), then a covered-position
    countDistinct per doc. Shuffle keys are high-cardinality and uniform;
    per-group state is bounded by document length. No windows, no collects,
    no Python.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    ).select(
        id_col, "toks", F.size("toks").alias("nt")
    )
    grams = (
        toks.where(F.col("nt") >= n)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.col("nt") - n + 1)).alias("i"),
            "toks",
        )
        .select(
            id_col, "i",
            F.concat_ws(" ", F.slice("toks", F.col("i"), n)).alias("g"),
        )
    )
    dup = (
        grams.groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select(id_col, "g")
    )
    covered = (
        grams.join(dup, [id_col, "g"], "left_semi")
        .select(
            id_col,
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("pos").alias("cov"))
    )
    return (
        toks.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.col("nt").cast("long").alias("n_tokens"),
            F.round(
                F.when(
                    F.col("nt") > 0,
                    F.coalesce("cov", F.lit(0)) / F.col("nt").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ngram_frac_r"),
        )
    )


def cross_dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-document duplicated-n-gram coverage — the distributed shape of
    exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", which removes substrings
    shared across documents; RefinedWeb applies the same family): per doc,
    the fraction of token positions covered by at least one ``n``-gram
    that occurs in ``min_docs`` or more DISTINCT documents. Complements
    :func:`dup_ngram_coverage`, whose duplication scope is within-doc.
    A corpus-wide near-1.0 score marks boilerplate/mirrored text; the
    usual pipeline drops docs (or spans) above a coverage threshold.

    Output: (id, n_tokens, cross_dup_frac_r), frac rounded 6dp; docs with
    fewer than ``n`` tokens score 0.0.

    Scale shape: n-gram starts explode to a bounded n rows per token; the
    corpus-wide duplicate detection groups by an int64 ``xxhash64`` of the
    gram (numeric shuffle keys, uniform and high-cardinality — never the
    gram strings) with a map-side-combined ``count_distinct(doc)``; the
    survivors flow back through a left-semi join ON THE SAME hash key
    (shuffle reuse), and coverage is one covered-position countDistinct
    per doc. No windows, no collects, no Python on the data path. At the
    100 TB point this is the identical plan with more partitions — the
    duplicate table is bounded by distinct repeated grams, a vanishing
    fraction of total grams in natural corpora.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (got {min_docs})")
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    ).select(id_col, "toks", F.size("toks").alias("nt"))
    grams = (
        toks.where(F.col("nt") >= n)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.col("nt") - n + 1)).alias("i"),
            "toks",
        )
        .select(
            id_col, "i",
            F.xxhash64(F.concat_ws(" ", F.slice("toks", F.col("i"), n)))
            .alias("gh"),
        )
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gh")
    )
    covered = (
        grams.join(dup, "gh", "left_semi")
        .select(
            id_col,
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("pos").alias("cov"))
    )
    return (
        toks.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.col("nt").cast("long").alias("n_tokens"),
            F.round(
                F.when(
                    F.col("nt") > 0,
                    F.coalesce("cov", F.lit(0)) / F.col("nt").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("cross_dup_frac_r"),
        )
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-style quality signal: per document, the mean negative log
    probability of its tokens under the corpus's own unigram language model
    (P(t) = corpus count of t / total tokens) — the distributed shape of
    CCNet-style LM filtering, with the n-gram LM reduced to the unigram
    case so the whole pass is exact SQL (no external model; swapping in
    pretrained n-gram probabilities is a broadcast-join drop-in).

    Output: (id, n_tokens, nll_per_tok_r) — high values = tokens rare in
    the corpus (noise, boilerplate, wrong language); empty docs score 0.
    Self-scoring means every token exists in the model, so no smoothing
    term is needed (a pretrained model needs one — parameterize then).

    Scale shape: one tokenize pass (JVM ``tokens_expr``), one
    map-side-combined count per term (vocabulary-sized result), one join of
    the per-doc term counts against that vocabulary table, one per-doc sum.
    Shuffle keys are term and doc id — high-cardinality, uniform.
    """
    tf = (
        docs.select(
            F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    ct = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = ct.agg(F.sum("ct")).collect()[0][0] or 0
    per_doc = (
        tf.join(ct, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(-F.col("tf") * F.log(F.col("ct") / F.lit(float(total))))
            .alias("_nll"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.when(F.coalesce("n_tokens", F.lit(0)) > 0,
                       F.col("_nll") / F.col("n_tokens")).otherwise(0.0),
                6,
            ).alias("nll_per_tok_r"),
        )
    )
