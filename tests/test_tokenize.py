"""Tokenizer golden cases + Arrow-path vs JVM-path equivalence."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from elastichash_spark.tokenize import tokenize_py, tokens_expr, with_term_freqs


def test_golden_cases():
    assert tokenize_py("Hello, World!") == ["hello", "world"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("  a  b ") == ["a", "b"]
    assert tokenize_py("a-b_c.d") == ["a", "b", "c", "d"]
    assert tokenize_py("W00000 w00000") == ["w00000", "w00000"]
    assert tokenize_py("123abc!!!") == ["123abc"]
    assert tokenize_py("...") == []


def test_arrow_udf_matches_python(spark, t1):
    """The Arrow tokenizer's (doclen, pairs) must equal per-row Python truth."""
    rows = (
        with_term_freqs(t1)
        .select("conv_id", "turn_idx", "text", "doclen", "pairs")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        toks = tokenize_py(r["text"])
        assert r["doclen"] == len(toks)
        expected = sorted(Counter(toks).items())
        got = [(p["term"], p["tf"]) for p in r["pairs"]]
        assert got == expected, (r["conv_id"], r["turn_idx"])


def test_jvm_expr_matches_python(spark, t1):
    rows = t1.select("text", tokens_expr(F.col("text")).alias("toks")).collect()
    for r in rows:
        assert r["toks"] == tokenize_py(r["text"])


def test_explode_kernel_matches_python(spark, t1):
    """The build's flat Arrow explode kernel equals per-row Python truth."""
    from pyspark.sql import functions as F

    from elastichash_spark.tokenize import TF_EXPLODED_SCHEMA, tf_explode_kernel

    src = t1.select(
        F.monotonically_increasing_id().alias("docID"),
        "text",
        F.lit(0).cast("int").alias("shard"),
        F.lit(0).cast("int").alias("salt"),
    )
    got = {}
    doclens = {}
    for r in src.mapInArrow(tf_explode_kernel, TF_EXPLODED_SCHEMA).collect():
        got[(r["docID"], r["term"])] = r["tf"]
        doclens.setdefault(r["docID"], r["doclen"])
    want = {}
    for r in src.select("docID", "text").collect():
        toks = tokenize_py(r["text"])
        for t, c in Counter(toks).items():
            want[(r["docID"], t)] = c
        if toks:
            assert doclens[r["docID"]] == len(toks)
    assert got == want


def test_pairs_sorted_by_term(spark, t1):
    rows = with_term_freqs(t1).select("pairs").collect()
    for r in rows:
        terms = [p["term"] for p in r["pairs"]]
        assert terms == sorted(terms)
        assert len(terms) == len(set(terms))


NON_ASCII_CASES = [
    "İstanbul Iİ and II",     # U+0130: full lowering = i + U+0307 (the one
                              # case where full-vs-simple mapping changes
                              # ASCII token structure)
    "ﬁnance ﬂow",             # ligatures (no lowercase expansion)
    "ＡＢＣ１２３ fullwidth",  # full-width digits/letters are separators
    "ÅNGSTRÖM Straße mix42",
    "naïve café",
    "ΣΙΣΥΦΟΣ greek",          # final-sigma contextual lowering (stripped)
    "a nbsp b",
    "🙂emoji42 ok",
]


def test_tokenizer_twins_agree_on_non_ascii(spark):
    """The three tokenizer implementations (Python re, JVM lower+split,
    Arrow utf8proc kernel) are pinned identical on special-casing
    codepoints — U+0130 full mapping, ligatures, full-width digits. A
    divergence here would skew doclen (JVM, docs stage) against tf (Arrow,
    tf stage) and corrupt BM25 length normalization."""
    from collections import Counter

    from pyspark.sql import functions as F

    from elastichash_spark.tokenize import (
        TF_EXPLODED_SCHEMA,
        tf_explode_kernel,
        tokenize_py,
        tokens_expr,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NON_ASCII_CASES)], "docID long, text string"
    )
    jvm = {
        r["docID"]: r["toks"]
        for r in df.select("docID", tokens_expr(F.col("text")).alias("toks")).collect()
    }
    src = df.select(
        "docID", "text", F.lit(0).cast("int").alias("shard"), F.lit(0).cast("int").alias("salt")
    )
    arrow_tf: dict = {}
    for r in src.mapInArrow(tf_explode_kernel, TF_EXPLODED_SCHEMA).collect():
        arrow_tf[(r["docID"], r["term"])] = r["tf"]
    for i, t in enumerate(NON_ASCII_CASES):
        py = tokenize_py(t)
        assert jvm[i] == py, (t, jvm[i], py)
        assert {(i, k): c for k, c in Counter(py).items()} == {
            kv: c for kv, c in arrow_tf.items() if kv[0] == i
        }, t


def test_analyze_tokens_positions(spark):
    """analyze_tokens (_analyze): 0-based positions over the POST-filter
    stream (punctuation runs never consume a position), lowercase folding,
    digits as tokens; empty / all-punct texts emit no rows."""
    from elastichash_spark.tokenize import analyze_tokens, tokenize_py

    texts = [(0, "Hello, World!! 123"), (1, "a--b"), (2, "..."), (3, ""),
             (4, None)]
    df = spark.createDataFrame(texts, "text_id long, text string")
    got = sorted((r["text_id"], r["pos"], r["token"])
                 for r in analyze_tokens(df).collect())
    want = sorted((i, p, t)
                  for i, txt in texts
                  for p, t in enumerate(tokenize_py(txt)))
    assert got == want
    assert (0, 2, "123") in got and (1, 1, "b") in got
    assert not [g for g in got if g[0] in (2, 3, 4)]


# ------------------------------- analyzer chain (stopwords + s-stemmer)

STEM_GOLDEN = [
    ("queries", "query"), ("spies", "spy"), ("ties", "ty"),
    ("eies", "eies"), ("aies", "aies"),        # -ies exemptions
    ("makes", "make"), ("batches", "batche"), ("classes", "classe"),
    ("goes", "goes"), ("sees", "sees"),        # -es exemptions (o/e before)
    ("tools", "tool"), ("its", "it"), ("toys", "toy"),
    ("pass", "pass"), ("status", "status"),    # -s exemptions (s/u before)
    ("es", "es"), ("s", "s"), ("is", "i"),     # short forms per the pin
    ("table", "table"), ("42s", "42"),
]

_STOPS = ("the", "a", "an", "and", "of", "is")


def test_stemmer_golden():
    from elastichash_spark.tokenize import stem_py

    for w, want in STEM_GOLDEN:
        assert stem_py(w) == want, (w, stem_py(w), want)


def test_analyzer_twins_agree(spark, t1):
    """tokenize_py, tokens_expr, and the Arrow kernel produce identical
    analyzed streams under a configured stop+stem chain: same tokens and
    order (JVM vs Python) and same (term, tf) + doclen after stem-merging
    (Arrow vs Python). doclen counts post-stopword tokens."""
    from collections import Counter

    from elastichash_spark.tokenize import (
        TF_EXPLODED_SCHEMA, make_tf_explode_kernel)

    jvm = t1.select(
        "text", tokens_expr(F.col("text"), _STOPS, True).alias("toks")
    ).collect()
    for r in jvm:
        assert r["toks"] == tokenize_py(r["text"], frozenset(_STOPS), True)

    src = t1.select(
        F.monotonically_increasing_id().alias("docID"), "text",
        F.lit(0).cast("int").alias("shard"), F.lit(0).cast("int").alias("salt"),
    )
    kernel = make_tf_explode_kernel(_STOPS, True)
    got, doclens = {}, {}
    for r in src.mapInArrow(kernel, TF_EXPLODED_SCHEMA).collect():
        got[(r["docID"], r["term"])] = r["tf"]
        doclens.setdefault(r["docID"], r["doclen"])
    want = {}
    for r in src.select("docID", "text").collect():
        toks = tokenize_py(r["text"], frozenset(_STOPS), True)
        for t, c in Counter(toks).items():
            want[(r["docID"], t)] = c
        if toks:
            assert doclens[r["docID"]] == len(toks)
    assert got == want


def test_analyze_tokens_with_analyzer(spark):
    """_analyze honors the configured chain: stopwords vanish (positions
    renumber over survivors — the pinned deviation from ES position gaps)
    and surviving tokens come back stemmed."""
    from elastichash_spark.tokenize import analyze_tokens

    df = spark.createDataFrame(
        [(0, "The queries of the tables"), (1, "the and of"), (2, "is")],
        "text_id long, text string")
    got = sorted((r["text_id"], r["pos"], r["token"])
                 for r in analyze_tokens(df, stopwords=_STOPS, stem=True)
                 .collect())
    assert got == [(0, 0, "query"), (0, 1, "table")]


def test_analyzer_twins_agree_with_synonyms(spark, t1):
    """All three twins agree under the FULL chain (stop + stem +
    synonym map), including tf merging of surfaces that map to one
    canonical in the Arrow kernel."""
    from collections import Counter

    from elastichash_spark.tokenize import (
        TF_EXPLODED_SCHEMA, make_tf_explode_kernel)

    syn = (("tool", "utility"), ("call", "invoke"))
    jvm = t1.select(
        "text", tokens_expr(F.col("text"), _STOPS, True, syn).alias("toks")
    ).collect()
    for r in jvm:
        assert r["toks"] == tokenize_py(r["text"], frozenset(_STOPS), True, syn)

    src = t1.select(
        F.monotonically_increasing_id().alias("docID"), "text",
        F.lit(0).cast("int").alias("shard"), F.lit(0).cast("int").alias("salt"),
    )
    kernel = make_tf_explode_kernel(_STOPS, True, syn)
    got = {}
    for r in src.mapInArrow(kernel, TF_EXPLODED_SCHEMA).collect():
        got[(r["docID"], r["term"])] = r["tf"]
    want = {}
    for r in src.select("docID", "text").collect():
        for t, c in Counter(
                tokenize_py(r["text"], frozenset(_STOPS), True, syn)).items():
            want[(r["docID"], t)] = c
    assert got == want


def test_synonym_config_guards():
    """IndexConfig refuses synonym maps that break analyzer idempotence:
    chained keys, canonicals that re-stem, canonicals in the stop list."""
    import pytest

    from elastichash_spark.build import IndexConfig

    with pytest.raises(ValueError, match="also synonym keys"):
        IndexConfig(synonyms=(("a", "b"), ("b", "c")))
    with pytest.raises(ValueError, match="stem-fixed"):
        IndexConfig(stem=True, synonyms=(("db", "tables"),))
    with pytest.raises(ValueError, match="stop list"):
        IndexConfig(stopwords=("the",), synonyms=(("teh", "the"),))
    # a well-formed map passes and normalizes deterministically (keys are
    # matched post-stem, so under stem=True useful keys are stem-fixed
    # forms — documented in tokenize.py)
    c = IndexConfig(stem=True, synonyms=(("db", "database"),))
    assert c.synonyms == [["db", "database"]]
