"""Search-response aggregations beyond plain facet counts: ES
``significant_terms`` and hit highlighting.

The reference exposes its results through Elasticsearch, whose response
shape couples hits with aggregations (`dh/app/main.py` consumes the raw
hit list; the DSL surface it queries supports aggs on the same request).
These operators reproduce the two response-enrichment features a transcript
search user reaches for first — "what terms characterize this match set"
and "show me where the query matched" — as pure DataFrame compositions
over the engine's own tables.

Scale shapes:
- significant_terms: the foreground is a per-query MATCH SET (bounded by
  the match count, not the corpus) and joins the corpus term-frequency
  table once on doc_id — a semi-join-shaped equi-join followed by one
  map-side-combined count per (qid, term). The background statistics come
  from the vocabulary-sized term dictionary (a dimension table; AQE
  broadcasts it). No corpus-wide shuffle beyond the one tf join.
- highlight: top-k-bounded hits x per-query terms (tiny) broadcast against
  the documents table; position arithmetic is whole-stage-codegen'd
  ``instr``/``substring`` — no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def significant_terms(
    matches: DataFrame,
    doc_terms: DataFrame,
    term_df: DataFrame,
    n_docs: int,
    top_n: int = 10,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    broadcast_matches: bool = False,
) -> DataFrame:
    """ES ``significant_terms`` aggregation: per query, the terms most
    over-represented in the foreground match set relative to the corpus
    background, scored with the JLH heuristic ES defaults to::

        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)   if fg_pct > bg_pct

    where fg_pct = (matching docs containing term) / (matching docs) and
    bg_pct = df(term) / N. Terms not over-represented score 0 and are
    dropped. Output: (qid, term, fg_count, bg_count, score_r) for the
    ``top_n`` terms per query, score DESC with term-ASC tie-break on the
    6dp-rounded score (float quotient order is engine-dependent at ~1e-15).

    ``matches``: (qid, doc_id) foreground sets — one row per matching doc.
    ``doc_terms``: (doc_id, term), distinct per document (tf is irrelevant:
    significance counts DOCUMENT frequency). ``term_df``: (term, df)
    background dictionary; ``n_docs``: corpus size.

    Reference analogue: the ES DSL surface the reference queries through
    (`dh/app/main.py:57-76` builds the request; aggs ride the same
    request). Two-sided exact: every arithmetic step is re-runnable in
    ANSI SQL.

    ``broadcast_matches``: hint that the foreground fits a broadcast (a
    (qid, doc_id) row is 16 bytes — even a million-doc hot-term match set
    is ~16 MB). The fg join then never shuffles ``doc_terms`` — the
    corpus-incidence-sized side streams map-side through a broadcast hash
    join straight into the partial aggregation, whose output is bounded by
    distinct (qid, term). Leave False when matches is itself corpus-sized
    ACROSS MANY qids (e.g. mining workloads) — there the shuffle join is
    the right plan.
    """
    if n_docs <= 0:
        raise ValueError(f"n_docs must be positive (got {n_docs})")
    fg_sizes = matches.groupBy(qid_col).agg(F.count("*").alias("fg_size"))
    m = F.broadcast(matches) if broadcast_matches else matches
    fg = (
        m.join(doc_terms, id_col)
        .groupBy(qid_col, "term")
        .agg(F.count("*").alias("fg_count"))
    )
    scored = (
        fg.join(fg_sizes, qid_col)
        .join(term_df.select("term", F.col("df").alias("bg_count")), "term")
        .withColumn("_fg_pct", F.col("fg_count") / F.col("fg_size"))
        .withColumn("_bg_pct", F.col("bg_count") / F.lit(float(n_docs)))
        .where(F.col("_fg_pct") > F.col("_bg_pct"))
        .withColumn(
            "score_r",
            F.round(
                (F.col("_fg_pct") - F.col("_bg_pct"))
                * (F.col("_fg_pct") / F.col("_bg_pct")),
                6,
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score_r"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(top_n))
        .select(qid_col, "term", "fg_count", "bg_count", "score_r")
    )


def highlight(
    hits: DataFrame,
    docs: DataFrame,
    query_terms: DataFrame,
    before: int = 30,
    width: int = 80,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``highlight`` made deterministic: for each hit, a snippet of the
    lowercased document text centered on the EARLIEST occurrence of any
    query term (as a substring — token-boundary-free, like ES's plain
    highlighter over a lowercase analyzer), ``before`` chars of left
    context, ``width`` chars total.

    ``hits``: (qid, ..., doc_id) — top-k-bounded. ``query_terms``:
    (qid, term), the tokenized queries. Hits whose text contains no query
    term as a substring (possible only if the hit came from expansion
    features, not plain match) get position 0 and a head-of-document
    snippet — total function, never a dropped row.

    All arithmetic is ``instr``/``substring``/``greatest`` — whole-stage
    codegen, identical semantics in DuckDB for the oracle twin. The
    documents table is scanned ONCE: the per-query term list broadcasts as
    an array column and the earliest position comes from an array
    expression, not a second corpus join.
    """
    qarr = query_terms.groupBy(qid_col).agg(
        F.array_sort(F.collect_set("term")).alias("_qterms")
    )
    return (
        hits.join(F.broadcast(qarr), qid_col, "left")
        .join(docs.select(id_col, F.lower(F.col(text_col)).alias("_lt")), id_col)
        .withColumn(
            "_pos",
            F.expr(
                "array_min(filter(transform(coalesce(_qterms, array()),"
                " t -> instr(_lt, t)), p -> p > 0))"
            ),
        )
        .withColumn("_start", F.greatest(F.lit(1), F.coalesce("_pos", F.lit(1)) - before))
        .withColumn(
            "snippet", F.expr(f"substring(_lt, _start, {int(width)})")
        )
        .drop("_qterms", "_pos", "_lt", "_start")
    )


def date_histogram(
    matches: DataFrame,
    docs_meta: DataFrame,
    ts_col: str,
    interval: str = "month",
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``date_histogram`` aggregation over a match set: per-query doc
    counts in calendar buckets of ``ts_col`` (``interval``: any
    ``date_trunc`` unit — 'hour', 'day', 'month', ...). Same scale shape
    as :func:`facet_counts` — the bucket key is just a computed facet, so
    the shuffle is bounded by distinct (qid, bucket) after map-side
    partial aggregation, never by match count. The bucket is emitted as a
    formatted string ('yyyy-MM-dd HH:mm:ss'), the engine-independent
    comparison form the suite uses for all time buckets."""
    bucket = F.date_format(
        F.date_trunc(interval, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    ).alias("bucket")
    return (
        matches.join(docs_meta.select(id_col, ts_col), id_col)
        .groupBy(qid_col, bucket)
        .agg(F.count("*").alias("n_docs"))
    )


def facet_counts(
    matches: DataFrame,
    docs_meta: DataFrame,
    facet_col: str,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``terms`` aggregation over a match set: per-query doc counts
    bucketed by a metadata column. ``matches``: (qid, doc_id) — feed it the
    engine's pre-merge candidate stream (``search(..., raw_matches=True)``)
    so a hot query's corpus-sized match set never funnels through the
    per-qid top-k window sort: the metadata join distributes over the
    match set and the groupBy's shuffle is bounded by distinct
    (qid, facet value) after map-side partial aggregation — the facet
    table never exceeds (queries x cardinality(facet_col)) rows."""
    return (
        matches.join(docs_meta, id_col)
        .groupBy(qid_col, facet_col)
        .agg(F.count("*").alias("n_docs"))
    )


def top_hits(
    matches: DataFrame,
    docs_meta: DataFrame,
    facet_col: str,
    n: int = 3,
    salt_buckets: int = 32,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """ES ``top_hits`` inside a ``terms`` aggregation: for every (query,
    facet bucket) the top-``n`` hits under the engine-independent order
    (round(score, 6) DESC, doc_id ASC), with a per-bucket ``rank``.

    Scale shape: two-phase top-n. A first window over (qid, facet,
    doc_id % salt_buckets) cuts every bucket to <= salt_buckets * n rows
    locally, so the global (qid, facet) window — whose partition would
    otherwise funnel a hot bucket's entire match set through one task's
    sort — only ever sees the salted survivors. Exact: the global top-n is
    contained in the union of per-salt top-n under the same total order."""
    rs = F.round(F.col(score_col), 6)
    salted = Window.partitionBy(
        qid_col, facet_col, (F.col(id_col) % salt_buckets)
    ).orderBy(rs.desc(), F.col(id_col).asc())
    bucket = Window.partitionBy(qid_col, facet_col).orderBy(
        rs.desc(), F.col(id_col).asc())
    return (
        matches.join(docs_meta.select(id_col, facet_col), id_col)
        .withColumn("_srn", F.row_number().over(salted))
        .where(F.col("_srn") <= int(n))
        .withColumn("rank", F.row_number().over(bucket))
        .where(F.col("rank") <= int(n))
        .drop("_srn")
    )


def cardinality(
    matches: DataFrame,
    docs_meta: DataFrame,
    col: str,
    approximate: bool = False,
    rsd: float = 0.05,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``cardinality`` + ``value_count`` aggregations over a match set:
    per query, the distinct count of a metadata column and the raw value
    count. ``approximate=True`` switches to HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — ES cardinality is
    itself HLL-approximate; the exact form is the oracle-comparable
    default. Scale shape: count_distinct's internal expand shuffles at most
    distinct (qid, value) pairs after partial aggregation; the HLL form
    shuffles one sketch per qid."""
    cd = (F.approx_count_distinct(col, rsd) if approximate
          else F.count_distinct(F.col(col)))
    return (
        matches.join(docs_meta.select(id_col, col), id_col)
        .groupBy(qid_col)
        .agg(cd.alias("cardinality"), F.count("*").alias("value_count"))
    )


def extended_stats(
    matches: DataFrame,
    docs_meta: DataFrame,
    col: str,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``extended_stats`` aggregation over a match set: per query, the
    count / min / max / sum / mean / population variance / population
    std-dev of a numeric metadata column. The moments are computed from
    EXACT integer power sums (sum x, sum x² as BIGINT — column values and
    corpus sizes keep them far inside the 2^63 range for any per-doc
    metadata field), then combined with the textbook formulas
    ``mean = Σx/n`` and ``var = Σx²/n − mean²`` — the identical literal
    arithmetic an ANSI-SQL twin reproduces bit-for-bit, unlike engine
    ``var_pop`` built-ins whose streaming update order is
    engine-dependent. Rounded 6dp.

    Scale shape: one metadata equi-join distributed over the match set,
    then a single map-side-combined groupBy whose shuffle is one row per
    qid. No windows, no Python."""
    c = F.col(col).cast("long")
    per = (
        matches.join(docs_meta.select(id_col, col), id_col)
        .groupBy(qid_col)
        .agg(
            F.count("*").alias("n"),
            F.min(c).alias("min_v"),
            F.max(c).alias("max_v"),
            F.sum(c).alias("sum_v"),
            F.sum(c * c).alias("_sum2"),
        )
    )
    mean = F.col("sum_v").cast("double") / F.col("n")
    var = F.col("_sum2").cast("double") / F.col("n") - mean * mean
    return per.select(
        qid_col, "n", "min_v", "max_v", "sum_v",
        F.round(mean, 6).alias("avg_r"),
        F.round(var, 6).alias("var_r"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std_r"),
    )


def histogram(
    matches: DataFrame,
    docs_meta: DataFrame,
    col: str,
    interval: int,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``histogram`` aggregation over a match set: per query, doc counts
    in fixed-width numeric buckets keyed by ``floor(value/interval) *
    interval`` (the ES bucket-key convention). Same scale shape as
    :func:`facet_counts` — the bucket key is a computed facet, so after
    map-side partial aggregation the shuffle is bounded by distinct
    (qid, bucket), never by match count."""
    if interval <= 0:
        raise ValueError(f"interval must be positive (got {interval})")
    bucket = (
        F.floor(F.col(col).cast("double") / F.lit(float(interval)))
        .cast("long") * F.lit(int(interval))
    ).alias("bucket")
    return (
        matches.join(docs_meta.select(id_col, col), id_col)
        .groupBy(qid_col, bucket)
        .agg(F.count("*").alias("n_docs"))
    )


def filters_counts(
    matches: DataFrame,
    docs_meta: DataFrame,
    filters: dict[str, str],
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``filters`` aggregation over a match set: one named bucket per
    caller-supplied predicate (SQL expressions over the metadata columns),
    counting the matching docs that satisfy each — buckets overlap freely,
    exactly like ES's named-filters response. Returns (qid, bucket,
    n_docs) INCLUDING zero-count buckets (ES keeps empty named buckets in
    the response).

    Scale shape: the predicates are evaluated as codegen'd conditional
    sums inside ONE map-side-combined groupBy over the metadata-joined
    match set — one pass, one row per qid in the shuffle — then unpivoted
    driver-free with ``stack`` into the bucket rows. Adding a bucket adds
    a column to the partial aggregate, not a join or a scan."""
    if not filters:
        raise ValueError("filters must be a non-empty {name: predicate} map")
    names = sorted(filters)
    joined = matches.join(docs_meta, id_col)
    agg = joined.groupBy(qid_col).agg(
        *[
            F.sum(F.when(F.expr(filters[n]), 1).otherwise(0)).alias(f"_b{i}")
            for i, n in enumerate(names)
        ]
    )
    pairs = ", ".join(f"'{n}', _b{i}" for i, n in enumerate(names))
    return agg.select(
        qid_col,
        F.expr(f"stack({len(names)}, {pairs}) as (bucket, n_docs)"),
    )


def parent_topk(
    scored: DataFrame,
    parent_col,
    score_mode: str = "sum",
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """ES ``has_child`` retrieval over the transcript parent/child shape
    (conversation = parent, turn = child): per query, parent units ranked
    by an aggregate of their matching children's scores — ``score_mode``
    in {'max', 'sum', 'avg', 'count'} (ES's min is max over negated; 'none'
    is 'count' with the count ignored). Feed the FULL scored match stream:
    a child page pruned at top-k would miss low-scoring siblings that sum
    into a winning parent (ES likewise scores has_child from all matching
    children). Returns (qid, parent, rank, n_children, pscore) under the
    engine-independent order (round(pscore, 6) DESC, parent ASC).

    Scale shape: one map-side-combined groupBy bounded by distinct
    (qid, parent), then the per-qid top-k window over parent-cardinality
    rows — matches never sort; ``parent_col`` may be any column or
    expression over the match stream (e.g. conv_id, or doc_id // block)."""
    modes = {"max": F.max(score_col), "sum": F.sum(score_col),
             "avg": F.avg(score_col), "count": F.count("*").cast("double")}
    if score_mode not in modes:
        raise ValueError(
            f"unknown score_mode {score_mode!r}; one of {sorted(modes)}")
    per = (
        scored.withColumn("parent", parent_col)
        .groupBy(qid_col, "parent")
        .agg(modes[score_mode].alias("pscore"),
             F.count("*").alias("n_children"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.round("pscore", 6).desc(), F.col("parent").asc())
    return (
        per.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(qid_col, "parent", "rank", "n_children", "pscore")
    )


def percentiles(
    matches: DataFrame,
    docs_meta: DataFrame,
    col: str,
    percents: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
    approximate: bool = False,
    accuracy: int = 10000,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``percentiles`` aggregation over a match set: per query, the
    requested percentiles of a numeric metadata column. Exact by default —
    SQL ``percentile`` with linear interpolation at rank (n-1)*p, the same
    convention DuckDB's ``quantile_cont`` pins, so the oracle can reproduce
    values to the ulp. ``approximate=True`` switches to
    ``percentile_approx`` (ES's own percentiles are TDigest-approximate) —
    the 100 TB path: a fixed-size sketch per (qid) instead of a full sort.
    Returns (qid, pct, value) rows."""
    ps = [float(p) for p in percents]
    fn = (F.percentile_approx(col, ps, accuracy) if approximate
          else F.percentile(col, F.lit(ps)))
    per = (
        matches.join(docs_meta.select(id_col, col), id_col)
        .groupBy(qid_col)
        .agg(fn.alias("_vals"))
    )
    pdf = F.posexplode("_vals")
    return (
        per.select(qid_col, pdf.alias("_i", "value"))
        .withColumn(
            "pct",
            F.element_at(F.lit(ps), F.col("_i").cast("int") + 1))
        .select(qid_col, "pct", "value")
    )
