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

    The index build's hot path: emitting flat columns (one groupby over the
    flattened token stream per batch) is much cheaper than materializing a
    nested array<struct> per row — no per-row Python objects reach Arrow.
    Docs whose text tokenizes to nothing emit no rows (doclen-0 docs exist
    only in the docs table; corpus stats account for them via N).
    """
    for b in batches:
        docid = b.column("docID").to_numpy()
        shard = b.column("shard").to_numpy()
        salt = b.column("salt").to_numpy()
        texts = b.column("text").to_pylist()
        toks = [
            [t for t in _SPLIT.split(x.lower()) if t] if x else [] for x in texts
        ]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        total = int(lens.sum())
        if total == 0:
            continue
        flat = np.empty(total, dtype=object)
        pos = 0
        for t in toks:
            if t:
                flat[pos : pos + len(t)] = t
                pos += len(t)
        rows = np.repeat(np.arange(len(toks)), lens)
        g = (
            pd.DataFrame({"i": rows, "t": flat})
            .groupby(["i", "t"], sort=True)
            .size()
            .reset_index(name="tf")
        )
        i = g["i"].to_numpy()
        yield pa.RecordBatch.from_pydict(
            {
                "docID": pa.array(docid[i], pa.int64()),
                "term": pa.array(g["t"], pa.string()),
                "tf": pa.array(g["tf"].astype("int32"), pa.int32()),
                "doclen": pa.array(lens[i].astype("int32"), pa.int32()),
                "shard": pa.array(shard[i], pa.int32()),
                "salt": pa.array(salt[i], pa.int32()),
            }
        )


def tokens_expr(text_col: Column) -> Column:
    """JVM-side equivalent token array (for oracle cross-checks).

    Catalyst-only: split + filter; identical output to ``tokenize_py`` on any
    input, letting tests assert the Arrow path against the JVM path.
    """
    arr = F.split(F.lower(F.coalesce(text_col, F.lit(""))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))
