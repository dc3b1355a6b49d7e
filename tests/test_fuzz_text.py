"""Hypothesis fuzz: tokenizer-twin parity and query-string parser totality.

The engine has three tokenizer implementations that MUST agree or queries
silently miss documents: ``tokenize_py`` (the pinned reference, used by
query parsing), ``_batch_tf`` (pandas batch twin), and
``tf_explode_kernel`` (the Arrow C++ build hot path — the one with real
divergence risk: utf8proc simple case mapping vs Python's SpecialCasing
full mapping, RE2 vs ``re``). Example-based tests pin known cases
(FIXTURES.md §3, the U+0130 'İ' pin in ``tokenize.py``); these properties
sweep arbitrary unicode for the unknown ones.

The parser properties assert ``parse_query_string`` is total (returns or
raises its two documented ValueErrors — never crashes, never leaks boost
markers into must_not, never invents tokens) plus an exact constructive
round-trip over well-formed dialect strings. Pure Python — no Spark.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elastichash_spark.query import _BOOST_RE, parse_boosts, parse_query_string
from elastichash_spark.tokenize import _batch_tf, tf_explode_kernel, tokenize_py

# plenty of separator/marker collisions plus raw unicode
_QUERYISH = st.text(
    alphabet=st.one_of(
        st.sampled_from(list('abc012 -^".\tİß')), st.characters()
    ),
    max_size=120,
)


@given(_QUERYISH)
@settings(max_examples=300, deadline=None)
def test_parse_query_string_total(text):
    """Any input either parses or raises the documented ValueError; parsed
    output never invents tokens, never keeps boost markers on must_not
    words, boosts only tokens of the positive text, and is deterministic."""
    try:
        p = parse_query_string(text)
    except ValueError:
        return
    assert set(p) == {"text", "boosts", "must_not", "phrase"}
    orig = set(tokenize_py(text))
    assert set(tokenize_py(p["text"])) <= orig
    assert set(tokenize_py(p["must_not"])) <= orig
    assert set(p["boosts"]) <= set(tokenize_py(p["text"]))
    for w in p["must_not"].split():
        assert _BOOST_RE.search(w) is None
    if p["phrase"]:
        assert p["boosts"] == {} and p["must_not"] == ""
    assert parse_query_string(text) == p


_WORD = st.from_regex(r"[a-z][a-z0-9]{0,7}", fullmatch=True)
_BOOST = st.from_regex(r"[0-9]{1,2}(\.[0-9]{1,2})?", fullmatch=True)
_PART = st.tuples(_WORD, st.none() | _BOOST, st.booleans())


@given(st.lists(_PART, min_size=1, max_size=8))
@settings(max_examples=300, deadline=None)
def test_parse_query_string_roundtrip(parts):
    """Constructive inverse: build a well-formed dialect string, predict the
    parse exactly (boost-last-wins, negated boosts stripped, must_not-only
    rejected)."""
    text = " ".join(
        ("-" if neg else "") + w + (f"^{b}" if b is not None else "")
        for w, b, neg in parts
    )
    pos = [(w, b) for w, b, neg in parts if not neg]
    neg = [w for w, _b, n in parts if n]
    if not pos:
        with pytest.raises(ValueError):
            parse_query_string(text)
        return
    p = parse_query_string(text)
    assert not p["phrase"]
    assert p["text"].split() == [w for w, _b in pos]
    assert p["must_not"].split() == neg
    boosts = {}
    for w, b in pos:
        if b is not None and float(b) != 1.0:
            boosts[w] = float(b)
    assert p["boosts"] == boosts


@given(st.lists(_WORD, min_size=1, max_size=6), _BOOST)
@settings(max_examples=100, deadline=None)
def test_parse_boosts_strips_markers(words, b):
    """parse_boosts returns marker-free text whose token multiset equals the
    input words, boosting exactly the marked ones."""
    text = " ".join(w + (f"^{b}" if i == 0 else "") for i, w in enumerate(words))
    plain, boosts = parse_boosts(text)
    assert plain.split() == words
    expect = {words[0]: float(b)} if float(b) != 1.0 else {}
    # a later unmarked duplicate of words[0] must NOT reset its boost
    assert boosts == expect


_TERM = st.from_regex(r"[a-z0-9]{0,10}", fullmatch=True)
_WILD = st.text(alphabet=list("ab01*?.+()[]\\^$|{}"), max_size=12)


@given(_WILD, _TERM)
@settings(max_examples=300, deadline=None)
def test_wildcard_to_regex_matches_glob_semantics(pattern, term):
    """wildcard_to_regex == glob semantics on the normalized vocabulary:
    * = any [a-z0-9] run, ? = exactly one, every other char literal (regex
    metachars in the pattern must never act as regex)."""
    import re as _re

    from elastichash_spark.query import wildcard_to_regex

    rx = _re.compile(wildcard_to_regex(pattern))

    def glob(p, t):
        if not p:
            return not t
        if p[0] == "*":
            return any(glob(p[1:], t[i:]) for i in range(len(t) + 1))
        if p[0] == "?":
            return bool(t) and glob(p[1:], t[1:])
        return bool(t) and t[0] == p[0] and glob(p[1:], t[1:])

    assert bool(rx.fullmatch(term)) == glob(pattern, term)


@given(st.lists(st.text(max_size=120), max_size=12))
@settings(max_examples=200, deadline=None)
def test_batch_tf_matches_tokenize_py(texts):
    """pandas batch twin == per-row reference on arbitrary unicode."""
    out = _batch_tf(pd.Series(texts, dtype=object))
    assert [int(x) for x in out["doclen"]] == [
        len(tokenize_py(t)) for t in texts
    ]
    for t, pairs in zip(texts, out["pairs"]):
        got = sorted((term, int(tf)) for term, tf in pairs)
        assert got == sorted(Counter(tokenize_py(t)).items())


@given(st.lists(st.text(max_size=120), max_size=10))
@settings(max_examples=200, deadline=None)
def test_tf_explode_kernel_matches_tokenize_py(texts):
    """Arrow C++ build kernel == per-row reference on arbitrary unicode
    (the twin whose divergence would corrupt the index, not just a test)."""
    n = len(texts)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(np.arange(n, dtype=np.int64)),
            pa.array(texts, pa.string()),
            pa.array((np.arange(n) % 3).astype(np.int32)),
            pa.array(np.zeros(n, dtype=np.int32)),
        ],
        names=["docID", "text", "shard", "salt"],
    )
    got: dict[int, list[tuple[str, int]]] = {}
    for out in tf_explode_kernel(iter([batch])):
        for r in out.to_pylist():
            i = int(r["docID"])
            toks = tokenize_py(texts[i])
            assert r["doclen"] == len(toks)
            assert r["shard"] == i % 3 and r["salt"] == 0
            got.setdefault(i, []).append((r["term"], int(r["tf"])))
    for i, t in enumerate(texts):
        expect = sorted(Counter(tokenize_py(t)).items())
        assert sorted(got.get(i, [])) == expect
