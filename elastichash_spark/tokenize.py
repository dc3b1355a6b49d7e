"""Pinned tokenizer — the engine's "feature extraction".

Transposes the reference's image feature extraction (PIL preprocess + remote
model inference, ``/root/reference/dh/app/util.py:44-133,172-219``) to text:
the payload-specific map from a raw row to index terms. Like the reference's
40-image batched inference (``dh/tools/import_csv.py:18``), it is batched and
vectorized — an Arrow pandas UDF (iterator form so the compiled regex is reused
across batches), never per-row Python on the Spark side.

Pinned spec (FIXTURES.md §3): lowercase; split on ``[^a-z0-9]+``; drop empty
tokens; no stemming; no stopwords.
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


def tokenize_py(text: str | None) -> list[str]:
    """Reference implementation (driver-side / tests / query parsing)."""
    if not text:
        return []
    return [t for t in _SPLIT.split(text.lower()) if t]


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


def tf_explode_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: (docID, text, shard, salt) rows -> flat exploded
    (docID, term, tf, doclen, shard, salt) rows.

    The index build's hot path. Tokenization runs entirely in Arrow C++
    (utf8_lower + split_pattern_regex) and the per-(doc, term) counting in
    numpy over dictionary codes — no Python string objects are ever created.
    (The previous pandas-object implementation was allocator-bound: per-core
    throughput halved from 2 to 8 concurrent workers under the object churn.)
    Same pinned semantics as ``tokenize_py``: lowercase, split on
    [^a-z0-9]+, drop empty tokens. Docs whose text tokenizes to nothing emit
    no rows (doclen-0 docs exist only in the docs table; corpus stats account
    for them via N).
    """
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
        # one u64 key per (row, code) pair; unique+counts = the tf table
        key = (rows << np.int64(32)) | codes
        ukey, counts = np.unique(key, return_counts=True)
        u_rows = (ukey >> np.int64(32)).astype(np.int64)
        u_codes = (ukey & np.int64(0xFFFFFFFF)).astype(np.int32)
        doclen = np.bincount(rows, minlength=n).astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(docid[u_rows], pa.int64()),
                dct.dictionary.take(pa.array(u_codes, pa.int32())),
                pa.array(counts.astype(np.int32), pa.int32()),
                pa.array(doclen[u_rows], pa.int32()),
                pa.array(shard[u_rows], pa.int32()),
                pa.array(salt[u_rows], pa.int32()),
            ],
            names=["docID", "term", "tf", "doclen", "shard", "salt"],
        )


def tokens_expr(text_col: Column) -> Column:
    """JVM-side equivalent token array (for oracle cross-checks).

    Catalyst-only: split + filter; identical output to ``tokenize_py`` on any
    input, letting tests assert the Arrow path against the JVM path.
    """
    arr = F.split(F.lower(F.coalesce(text_col, F.lit(""))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


def analyze_tokens(
    df: DataFrame, id_col: str = "text_id", text_col: str = "text"
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
    rows, like ES."""
    pe = F.posexplode(tokens_expr(F.col(text_col)))
    return df.select(F.col(id_col), pe.alias("pos", "token"))
