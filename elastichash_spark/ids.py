"""Deterministic, scale-safe dense ordinal assignment.

The reference assigns label ids with ``ROW_NUMBER() OVER (ORDER BY labelname)``
(``/root/reference/experiments/openimages.py:32,47,76``) — fine at its scale,
but a global unpartitioned window is a single-task bottleneck at 10^12 rows.
This helper computes the same value-deterministic global rank with a two-pass
range-partition scheme:

1. range-partition + sort by the order columns (parallel),
2. count rows per partition (tiny aggregate), prefix-sum the counts on the
   driver, and add each partition's offset to its local row_number.

The result equals the global ``row_number() - 1`` regardless of partition
boundaries (range partitioning guarantees inter-partition order), so the ids
are independent of sampling, parallelism, and input layout.

NEVER use ``monotonically_increasing_id`` for document identity — it depends
on physical partitioning (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sort_exprs(order_cols: list):
    """Each element: column name (ascending) or (name, 'desc')."""
    exprs = []
    for c in order_cols:
        if isinstance(c, tuple):
            name, direction = c
            exprs.append(F.col(name).desc() if direction == "desc" else F.col(name).asc())
        else:
            exprs.append(F.col(c).asc())
    return exprs


def with_ordinal_lazy(
    df: DataFrame,
    order_cols: list,
    id_col: str = "ordinal",
    num_partitions: int | None = None,
):
    """Two-pass ordinal, lazy form: returns ``(out, total, finish)``.

    ``out`` is NOT yet materialized — the caller must run exactly ONE action
    on it (typically a parquet write; that action is then the only pass over
    the data besides the internal count) and call ``finish()`` afterwards to
    release the persisted range partitioning. ``total`` is the row count,
    already computed by the internal per-partition count — callers need no
    separate ``count()`` job.
    """
    if num_partitions is None:
        # 4x the core count: one-range-per-core means a single task wave with
        # no rebalancing slack (a straggler = direct wall-clock loss)
        num_partitions = 4 * df.sparkSession.sparkContext.defaultParallelism
    sort_exprs = _sort_exprs(order_cols)
    ranged = (
        df.repartitionByRange(num_partitions, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*_sort_exprs(order_cols))
    out = (
        ranged.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, F.row_number().over(w).cast("long") + F.col("_offset") - F.lit(1))
        .drop("_pid", "_offset")
    )
    return out, acc, lambda: ranged.unpersist()


def with_running_total(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Inclusive running total of ``val_col`` following ORDER BY
    ``order_cols`` — the prefix-sum sibling of :func:`with_ordinal`, same
    two-pass scheme (range-partition + per-partition totals prefix-summed
    on the driver), so no global single-task window at any scale. Returns
    ``(out, grand_total)``; the result is materialized (localCheckpoint)
    for the same boundary-drift reason as :func:`with_ordinal`.

    Used by the build's postings merge to cut the term dictionary into
    df-mass-balanced CONTIGUOUS termID ranges (merge buckets): contiguity
    needs the order, balance needs the weighted prefix sum — a plain
    hash-mod of termID balances but scatters each output file across the
    whole termID range, defeating parquet min/max file skipping."""
    if num_partitions is None:
        num_partitions = 4 * df.sparkSession.sparkContext.defaultParallelism
    sort_exprs = _sort_exprs(order_cols)
    ranged = (
        df.repartitionByRange(num_partitions, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    try:
        sums = {
            r["_pid"]: int(r["s"] or 0)
            for r in ranged.groupBy("_pid")
            .agg(F.sum(F.col(val_col).cast("long")).alias("s"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += sums[pid]
        offsets_df = df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "_pid int, _offset long",
        )
        w = Window.partitionBy("_pid").orderBy(*_sort_exprs(order_cols))
        out = (
            ranged.join(F.broadcast(offsets_df), "_pid")
            .withColumn(
                out_col,
                F.sum(F.col(val_col).cast("long")).over(w) + F.col("_offset"),
            )
            .drop("_pid", "_offset")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out, acc


def with_ordinal(
    df: DataFrame,
    order_cols: list,
    id_col: str = "ordinal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 0-based dense ordinal following ORDER BY ``order_cols``.

    ``order_cols`` must be a total key (ties would make the rank ambiguous);
    elements are column names (ascending) or ``(name, 'desc')`` tuples.
    The input is persisted for the duration of the two passes so the sampled
    range boundaries cannot drift between them; the result is materialized
    (localCheckpoint) so downstream reuse cannot recompute with fresh samples.
    """
    out, _total, finish = with_ordinal_lazy(df, order_cols, id_col, num_partitions)
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        finish()
    return out
