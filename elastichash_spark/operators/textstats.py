"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure JVM column expressions (regexp/array
functions) so they run inside whole-stage codegen with zero Python on the
data path, and every one has an exact ANSI-SQL twin for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_expr

# distinct-token markers per language (tiny heuristic dictionaries)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "los", "y", "es", "las"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # tie-break order

STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    return F.size(tokens_expr(text))


def lang_scores(text: Column) -> dict[str, Column]:
    """Distinct marker hits per language."""
    toks = F.array_distinct(tokens_expr(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang): argmax marker hits with pinned priority tie-break;
    'und' (undetermined) when no marker hits at all."""
    scores = lang_scores(F.col(text_col))
    best = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] > 0
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            op = scores[lang] >= scores[other] if LANG_PRIORITY.index(other) > LANG_PRIORITY.index(lang) else scores[lang] > scores[other]
            cond = cond & op
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    pred = best.otherwise(F.lit("und"))
    return docs.select(F.col(id_col), pred.alias("pred_lang"))


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, stop_ratio_r, alnum_ratio_r, quality_r).

    quality = 0.4*min(1, n_tokens/100) + 0.3*stop_ratio + 0.3*alnum_ratio —
    an explicit, engine-portable formula (the payload-agnostic analogue of a
    learned quality model; the plumbing is the point, all rounded to 6dp).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_expr(text)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens.cast("double")).otherwise(F.lit(0.0))
    n_alnum = (n_chars - F.length(F.regexp_replace(F.lower(text), "[a-z0-9 ]", ""))).cast("double")
    alnum_ratio = F.when(n_chars > 0, n_alnum / n_chars.cast("double")).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * alnum_ratio
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(stop_ratio, 6).alias("stop_ratio_r"),
        F.round(alnum_ratio, 6).alias("alnum_ratio_r"),
        F.round(quality, 6).alias("quality_r"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp): md5 of the normalized token stream — the exact-dedup /
    provenance key."""
    return docs.select(
        F.col(id_col),
        F.md5(F.array_join(tokens_expr(F.col(text_col)), " ")).alias("fp"),
    )


# BPE-ish pre-tokenization: letter runs, digit runs, or single non-space
# symbols — the regex family GPT-2-style tokenizers use for pre-splitting,
# restricted to a dialect Java regex and RE2 (DuckDB) evaluate identically.
BPE_SPLIT_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace token count and BPE-ish
    pre-token count — the two standard corpus size estimators. Pure JVM
    regexp exprs (codegen), no Python."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.trim(text)
    ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_SPLIT_RE), F.lit(0)))
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )
