"""Pinned tokenizer — the engine's "feature extraction".

Transposes the reference's image feature extraction (PIL preprocess + remote
model inference, ``/root/reference/dh/app/util.py:44-133,172-219``) to text:
the payload-specific map from a raw row to index terms. Like the reference's
40-image batched inference (``dh/tools/import_csv.py:18``), it is batched and
vectorized — an Arrow pandas UDF (iterator form so the compiled regex is reused
across batches), never per-row Python on the Spark side.

Pinned spec (FIXTURES.md §3): lowercase; split on ``[^a-z0-9]+``; drop empty
tokens. The DEFAULT analyzer adds no stemming and no stopwords; an index may
configure an analyzer CHAIN (ES ``analysis`` analogue) of a stopword filter
followed by the pinned suffix stemmer — both applied identically by all
three tokenizer twins (Python, JVM expression, Arrow kernel) and by the
DuckDB oracle SQL.

Analyzer chain pin (applied after lowercase+split+drop-empty):
1. stopword filter: drop tokens in the index's configured stopword set
   (checked on the UNSTEMMED token — the ES default ordering of
   stop-then-stemmer filters);
2. optional stemmer: the three-rule "s-stemmer" (Harman 1991, "How
   Effective Is Suffixing?" — a pinned, cross-engine-exact simplification
   of Porter), expressed as three sequential regex substitutions chosen so
   at most one can fire per token:
     ``([^ae])ies$  -> \\1y``   (queries -> query; exempts -aies/-eies)
     ``([^aeoi])es$ -> \\1e``   (makes -> make; exempts -aes/-ees/-oes and
                                 every -ies word the first rule handled or
                                 exempted)
     ``([^use])s$   -> \\1``    (tools -> tool; exempts -ss/-us and the
                                 -es endings above)
   No minimum-length guard beyond the one preceding character each
   pattern requires. Stemming never changes token COUNT, so ``doclen``
   depends only on the stopword filter (doclen counts INDEXED tokens,
   Lucene norms semantics);
3. optional synonym map (ES synonym filter, index-time, the
   contract-merging form): a pinned (surface -> canonical) mapping
   applied AFTER stemming — keys are therefore matched against the
   POST-stem token and should themselves be stemmed forms; values are
   taken as canonical verbatim (applied once, never recursively). Mapped
   tokens merge with the canonical term's postings (tf adds, df merges),
   exactly like Lucene's index-time synonym graph in its
   single-token-to-single-token form. Token count is unchanged, so
   doclen is unaffected.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT_RE = r"[^a-z0-9]+"
_SPLIT = re.compile(TOKEN_SPLIT_RE)

# the pinned s-stemmer as (pattern, replacement) pairs — the SAME patterns
# run in Java regex (Spark regexp_replace, $1 backrefs) and RE2 (DuckDB
# regexp_replace, \1 backrefs); sequential application, at most one fires
STEM_RULES: tuple[tuple[str, str], ...] = (
    (r"([^ae])ies$", r"\1y"),
    (r"([^aeoi])es$", r"\1e"),
    (r"([^use])s$", r"\1"),
)
_STEM_SUBS = [(re.compile(p), r) for p, r in STEM_RULES]


def stem_py(token: str) -> str:
    """Pinned s-stemmer, Python twin (see module docstring)."""
    for pat, rep in _STEM_SUBS:
        token = pat.sub(rep, token)
    return token


def tokenize_py(
    text: str | None,
    stopwords: frozenset[str] | tuple[str, ...] = (),
    stem: bool = False,
    synonyms: dict[str, str] | tuple = (),
) -> list[str]:
    """Reference implementation (driver-side / tests / query parsing).
    ``stopwords``/``stem``/``synonyms`` apply the index's configured
    analyzer chain in that pinned order; the defaults are the no-op
    analyzer."""
    if not text:
        return []
    toks = [t for t in _SPLIT.split(text.lower()) if t]
    if stopwords:
        sw = stopwords if isinstance(stopwords, frozenset) else frozenset(stopwords)
        toks = [t for t in toks if t not in sw]
    if stem:
        toks = [stem_py(t) for t in toks]
    if synonyms:
        syn = synonyms if isinstance(synonyms, dict) else dict(
            (k, v) for k, v in synonyms)
        toks = [syn.get(t, t) for t in toks]
    return toks


# Spark return type of the batched tokenizer: per-row doclen + (term, tf) pairs
# sorted ascending by term (determinism for downstream float accumulation).
TF_STRUCT = T.StructType(
    [
        T.StructField("doclen", T.IntegerType(), False),
        T.StructField(
            "pairs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("tf", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _batch_tf(texts: pd.Series) -> pd.DataFrame:
    """Vectorized per-batch tokenize + within-row term counting.

    Flattens all tokens of the batch into one frame and groupby-counts once —
    no per-row Python dict building.
    """
    lowered = texts.fillna("").str.lower()
    token_lists = lowered.str.split(TOKEN_SPLIT_RE)
    # remove empty strings produced by leading/trailing separators
    token_lists = token_lists.map(lambda toks: [t for t in toks if t])
    doclens = token_lists.str.len().astype("int32")
    n = len(texts)
    if n == 0 or int(doclens.sum()) == 0:
        return pd.DataFrame(
            {"doclen": doclens, "pairs": [[] for _ in range(n)]}
        )
    row_idx = np.repeat(np.arange(n), doclens.to_numpy())
    flat = pd.DataFrame(
        {
            "i": row_idx,
            "term": np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t]),
        }
    )
    counted = (
        flat.groupby(["i", "term"], sort=True).size().rename("tf").reset_index()
    )
    counted["tf"] = counted["tf"].astype("int32")
    pairs_by_row = {
        i: list(zip(g["term"], g["tf"]))
        for i, g in counted.groupby("i", sort=False)
    }
    return pd.DataFrame(
        {
            "doclen": doclens,
            "pairs": [pairs_by_row.get(i, []) for i in range(n)],
        }
    )


@F.pandas_udf(TF_STRUCT)
def tf_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """Arrow-batched tokenizer: text -> (doclen, [(term, tf)...] sorted by term)."""
    for texts in batches:
        yield _batch_tf(texts)


def with_term_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``doclen`` and exploded ``(term, tf)`` columns.

    tf is computed row-locally inside the Arrow batch (no shuffle needed for
    within-document counting — the groupBy(doc, term) a naive explode would
    cost is avoided entirely; at 10^12 turns that shuffle would dominate).
    """
    tok = df.withColumn("_tok", tf_udf(F.col(text_col)))
    return tok.withColumn("doclen", F.col("_tok.doclen")).withColumn(
        "pairs", F.col("_tok.pairs")
    ).drop("_tok")


TF_EXPLODED_SCHEMA = (
    "docID long, term string, tf int, doclen int, shard int, salt int"
)


def make_tf_explode_kernel(
    stopwords: tuple[str, ...] = (), stem: bool = False,
    synonyms: dict[str, str] | tuple = (),
):
    """Build the mapInArrow tokenize-explode kernel for a given analyzer
    chain: (docID, text, shard, salt) rows -> flat exploded
    (docID, term, tf, doclen, shard, salt) rows.

    The index build's hot path. Tokenization runs entirely in Arrow C++
    (utf8_lower + split_pattern_regex) and the per-(doc, term) counting in
    numpy over dictionary codes — no Python string objects are ever created
    on the default analyzer. A configured analyzer touches Python strings
    only for the batch's DICTIONARY values (distinct terms, vocabulary-
    bounded — orders of magnitude smaller than the token stream): stopword
    membership masks token instances through their codes, and
    stemming/synonym-mapping remap the dictionary then re-encode codes so
    merged terms count as one. Same pinned semantics as ``tokenize_py``:
    lowercase, split on [^a-z0-9]+, drop empty tokens, stopword drop
    before stemming before synonyms; doclen counts post-stopword
    (indexed) tokens. Docs whose text tokenizes to nothing emit no rows
    (doclen-0 docs exist only in the docs table; corpus stats account for
    them via N).
    """
    sw = frozenset(stopwords)
    syn = synonyms if isinstance(synonyms, dict) else dict(
        (k, v) for k, v in synonyms)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        from .session import disable_thp

        disable_thp()
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            docid = b.column("docID").to_numpy()
            shard = b.column("shard").to_numpy()
            salt = b.column("salt").to_numpy()
            text = pc.fill_null(b.column("text"), "")
            # Unicode full-vs-simple case-mapping pin: utf8proc lowers U+0130
            # ('İ') to bare 'i' (simple mapping) while Python str.lower and JVM
            # toLowerCase produce 'i' + U+0307 (SpecialCasing full mapping) — the
            # one divergence that changes ASCII token structure ('İstanbul' →
            # 'istanbul' vs 'i'+'stanbul'). Pre-substituting the full mapping
            # keeps the three tokenizer twins (Python, JVM, Arrow) identical;
            # tests pin this with non-ASCII fixtures.
            text = pc.replace_substring(text, "İ", "i̇")
            toks = pc.split_pattern_regex(pc.utf8_lower(text), TOKEN_SPLIT_RE)
            offs = toks.offsets.to_numpy()
            values = toks.values  # flat StringArray, includes empty tokens
            if len(values) == 0:
                continue
            rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
            keep = pc.not_equal(values, "")
            keep_np = keep.to_numpy(zero_copy_only=False)
            rows = rows_all[keep_np]
            if rows.size == 0:
                continue
            # dictionary codes replace term strings for the counting pass
            dct = pc.dictionary_encode(values.filter(keep))
            codes = dct.indices.to_numpy().astype(np.int64)
            dictionary = dct.dictionary
            if sw or stem or syn:
                terms = dictionary.to_pylist()
                if sw:
                    # stopword drop by CODE: mask the few dictionary slots,
                    # gather the mask through the instance codes
                    term_keep = np.array(
                        [t not in sw for t in terms], dtype=bool)
                    inst_keep = term_keep[codes]
                    rows, codes = rows[inst_keep], codes[inst_keep]
                    if rows.size == 0:
                        continue
                if stem or syn:
                    # stem + synonym-map the DICTIONARY, then remap codes
                    # so surface forms sharing an analyzed form merge into
                    # one term (their tfs combine in the unique-count
                    # below)
                    mapped = np.array(
                        [syn.get(s, s) for s in
                         ((stem_py(t) if stem else t) for t in terms)],
                        dtype=object)
                    uniq, remap = np.unique(mapped, return_inverse=True)
                    codes = remap.astype(np.int64)[codes]
                    dictionary = pa.array(uniq, pa.string())
            # one u64 key per (row, code) pair; unique+counts = the tf table
            key = (rows << np.int64(32)) | codes
            ukey, counts = np.unique(key, return_counts=True)
            u_rows = (ukey >> np.int64(32)).astype(np.int64)
            u_codes = (ukey & np.int64(0xFFFFFFFF)).astype(np.int32)
            doclen = np.bincount(rows, minlength=n).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(docid[u_rows], pa.int64()),
                    dictionary.take(pa.array(u_codes, pa.int32())),
                    pa.array(counts.astype(np.int32), pa.int32()),
                    pa.array(doclen[u_rows], pa.int32()),
                    pa.array(shard[u_rows], pa.int32()),
                    pa.array(salt[u_rows], pa.int32()),
                ],
                names=["docID", "term", "tf", "doclen", "shard", "salt"],
            )

    return kernel


# default-analyzer kernel (the pinned no-op chain) — the build's default path
tf_explode_kernel = make_tf_explode_kernel()


def stem_expr(tok: Column) -> Column:
    """Pinned s-stemmer, JVM twin: the same STEM_RULES patterns through
    Spark ``regexp_replace`` (Java regex, ``$1`` backrefs)."""
    for pat, rep in STEM_RULES:
        tok = F.regexp_replace(tok, pat, rep.replace("\\1", "$1"))
    return tok


def tokens_expr(
    text_col: Column,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    synonyms: dict[str, str] | tuple = (),
) -> Column:
    """JVM-side equivalent token array (for oracle cross-checks).

    Catalyst-only: split + filter (+ the configured analyzer chain:
    stopword drop, the pinned s-stemmer via regexp_replace, then the
    synonym map as an element_at over a map literal); identical output to
    ``tokenize_py`` on any input, letting tests assert the Arrow path
    against the JVM path.
    """
    arr = F.split(F.lower(F.coalesce(text_col, F.lit(""))), TOKEN_SPLIT_RE)
    if stopwords:
        sw = sorted(set(stopwords))
        arr = F.filter(arr, lambda t: (t != F.lit("")) & ~t.isin(*sw))
    else:
        arr = F.filter(arr, lambda t: t != F.lit(""))
    if stem:
        arr = F.transform(arr, stem_expr)
    if synonyms:
        syn = synonyms if isinstance(synonyms, dict) else dict(
            (k, v) for k, v in synonyms)
        m = F.create_map(*[F.lit(x) for kv in sorted(syn.items()) for x in kv])
        arr = F.transform(arr, lambda t: F.coalesce(F.element_at(m, t), t))
    return arr


def analyze_tokens(
    df: DataFrame, id_col: str = "text_id", text_col: str = "text",
    stopwords: tuple[str, ...] = (), stem: bool = False,
    synonyms: dict[str, str] | tuple = (),
) -> DataFrame:
    """ES ``_analyze`` endpoint: the analyzer's token stream for arbitrary
    texts — (id, position, token) rows with ES's 0-based positions over
    the POST-filter stream (ES's own _analyze numbers surviving tokens,
    not raw split slots; empty fragments from punctuation runs never get
    a position). The debugging surface every ES user pokes first when a
    query doesn't match; the reference's analyzer is exactly this
    lowercase-alphanumeric split (whitespace analyzer over lowercased
    hex/text fields in its mappings, `dh/tools/import_csv.py:103-124`).

    Pure codegen: split + filter + posexplode — no Python, no shuffle at
    all (the output is a per-row flatMap). Texts with zero tokens emit no
    rows, like ES. ``stopwords``/``stem`` run the configured analyzer
    chain; positions renumber contiguously over the POST-filter stream —
    a pinned, documented deviation from ES's stop filter, which leaves
    position-increment gaps (this engine's phrase semantics treat
    stop-dropped tokens as absent, so "call the tool" phrase-matches
    "call tool" under a stopword analyzer)."""
    pe = F.posexplode(tokens_expr(F.col(text_col), stopwords, stem, synonyms))
    return df.select(F.col(id_col), pe.alias("pos", "token"))
