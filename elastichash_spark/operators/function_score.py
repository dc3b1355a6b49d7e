"""ES ``function_score`` decay scoring: recency-weighted BM25.

ES multiplies the query score by a decay function of a numeric/date field's
distance from an origin — ``gauss``, ``exp``, or ``linear``, parameterized
by (origin, scale, offset, decay) with the contract that the factor equals
``decay`` exactly at distance ``scale`` and 1.0 inside ``offset``. The
reference's app reaches search through exactly this DSL surface
(``/root/reference/dh/app/main.py`` builds function_score requests via the
stored-script template family, ``es_query.7.x.json``).

Scale shape: the decay is one whole-stage-codegen'd expression over the
scored match stream joined once to the (doc, ts) dimension columns — no
Python, no extra shuffle beyond the metadata equi-join that facets already
pay. The ranking side cannot use block-max pruning under an arbitrary
multiplicative factor (ES likewise disables its max-score optimizations
inside function_score), so callers feed the FULL scored match set (exact
strategy / full-k enumeration) and cut top-k after the multiply; a decay
factor is bounded by 1.0, so an engine that wanted a pruned path could
still use undecayed WAND bounds as admissible upper bounds — noted, not
needed at the ES-analogue design point.

All distances are computed in DAYS as doubles from epoch seconds; the
decay rate constant is folded into one Python-computed double literal so
an ANSI-SQL twin using the same literal reproduces the factor to the ulp
of ``exp``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KINDS = ("gauss", "exp", "linear")


def decay_factor(
    ts: Column,
    origin_epoch: float,
    scale_days: float,
    decay: float = 0.5,
    offset_days: float = 0.0,
    kind: str = "gauss",
) -> Column:
    """The ES decay multiplier as one JVM expression over a timestamp
    column. ``gauss``: exp(ln(decay)/scale² · d²); ``exp``: exp(ln(decay)/
    scale · d); ``linear``: max(0, (s−d)/s) with s = scale/(1−decay) —
    each satisfies factor(scale) = decay, factor(0..offset) = 1."""
    if kind not in KINDS:
        raise ValueError(f"unknown decay kind {kind!r}; one of {KINDS}")
    if scale_days <= 0 or not (0.0 < decay < 1.0):
        raise ValueError("need scale_days > 0 and 0 < decay < 1")
    dist = (
        F.abs(F.lit(float(origin_epoch))
              - F.unix_timestamp(ts).cast("double"))
        / F.lit(86400.0)
    )
    adj = F.greatest(dist - F.lit(float(offset_days)), F.lit(0.0))
    if kind == "gauss":
        return F.exp(F.lit(math.log(decay) / (scale_days ** 2)) * adj * adj)
    if kind == "exp":
        return F.exp(F.lit(math.log(decay) / scale_days) * adj)
    s = scale_days / (1.0 - decay)
    return F.greatest(F.lit(0.0), (F.lit(s) - adj) / F.lit(s))


MODIFIERS = ("none", "log1p", "sqrt")


def field_value_factor(
    scored: DataFrame,
    docs_meta: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "log1p",
    missing: float = 1.0,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """ES ``function_score`` ``field_value_factor``: multiply each hit's
    score by ``modifier(factor * field)`` — ``log1p`` = ln(1 + x) (the ES
    modifier of the same name), ``sqrt``, or ``none``. Docs missing from
    ``docs_meta`` use the ``missing`` value for the FIELD (ES's ``missing``
    parameter), then go through the same modifier.

    Same contract as :func:`decay_multiply`: feed the FULL scored match
    set and cut top-k after the multiply — an arbitrary multiplicative
    factor reorders ranks, so ES disables its max-score pruning inside
    function_score and so must callers here. One metadata equi-join plus
    one whole-stage-codegen'd expression; no Python, no extra shuffle."""
    if modifier not in MODIFIERS:
        raise ValueError(
            f"unknown modifier {modifier!r}; one of {MODIFIERS}")
    x = F.coalesce(F.col(field).cast("double"), F.lit(float(missing))) \
        * F.lit(float(factor))
    if modifier == "log1p":
        mult = F.log1p(x)
    elif modifier == "sqrt":
        mult = F.sqrt(x)
    else:
        mult = x
    return (
        scored.join(docs_meta.select(id_col, field), id_col, "left")
        .withColumn(score_col, F.col(score_col) * mult)
        .drop(field)
    )


def decay_multiply(
    scored: DataFrame,
    docs_meta: DataFrame,
    ts_col: str,
    origin_epoch: float,
    scale_days: float,
    decay: float = 0.5,
    offset_days: float = 0.0,
    kind: str = "gauss",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Multiply each scored row's ``score_col`` by the decay factor of its
    doc's ``ts_col`` (from ``docs_meta``: one row per ``id_col``). Feed the
    FULL scored match set and cut top-k afterwards — the multiply reorders
    ranks, so a pre-cut top-k page would be result-wrong."""
    factor = decay_factor(
        F.col(ts_col), origin_epoch, scale_days, decay, offset_days, kind)
    return (
        scored.join(docs_meta.select(id_col, ts_col), id_col)
        .withColumn(score_col, F.col(score_col) * factor)
        .drop(ts_col)
    )
