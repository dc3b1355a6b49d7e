"""Pinned BM25 scoring — the single definition shared by oracle and engine.

This is the analogue of the reference's one server-side scoring function, the
``hd64`` Painless script (``/root/reference/dh/tools/add_hdist.py:18-22``):
registered once, invoked identically everywhere. Pinning one variant makes
"reference BM25" a well-defined function (SURVEY.md §7.3):

- k1 = 1.2, b = 0.75
- idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)      (Lucene/ES BM25+ idf, >= 0)
- score(q, d) = sum over DISTINCT query terms t of
      idf(t) * tf / (tf + k1 * (1 - b + b * doclen / avgdl))
- duplicate query terms count once; df=0 terms contribute 0
- float64 throughout; accumulation in ascending termID order
- total order of results: (score DESC, docID ASC); score-0 docs not returned
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    """Scalar idf, float64."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def idf_np(n_docs: int, df: np.ndarray) -> np.ndarray:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def idf_col(n_docs: int, df: Column) -> Column:
    """idf as a Catalyst column expression (JVM-side, codegen'd)."""
    return F.log((F.lit(float(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))


def tf_part_np(tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
    """The idf-free tf-saturation part: tf / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64, copy=False)
    norm = K1 * (1.0 - B + B * (doclen.astype(np.float64) / avgdl))
    return tf / (tf + norm)


def tf_part_col(tf: Column, doclen: Column, avgdl: float) -> Column:
    tfd = tf.cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (doclen.cast("double") / F.lit(float(avgdl))))
    return tfd / (tfd + norm)


def contribution_col(tf: Column, doclen: Column, df: Column, n_docs: int, avgdl: float) -> Column:
    """Full per-(term, doc) BM25 contribution as a column expression."""
    return idf_col(n_docs, df.cast("double")) * tf_part_col(tf, doclen, avgdl)


def bm25_sql(k1: float = K1, b: float = B) -> dict[str, str]:
    """SQL fragments of the pinned formulas (ANSI; used for DuckDB oracles)."""
    return {
        "idf": "ln(({N} - {df} + 0.5) / ({df} + 0.5) + 1.0)",
        "tf_part": f"{{tf}} / ({{tf}} + {k1} * (1 - {b} + {b} * {{dl}} / {{avgdl}}))",
    }
