"""Sessionization over event streams — gap-based session assignment as
window functions (lag + running sum), the standard large-pipeline shape for
activity logs.

Spark-first: one shuffle on user_id (the window partition key), everything
else inside whole-stage codegen. The total order within a user is pinned as
(ts, event_id) so session numbering is deterministic under ts ties.

At 100 TB the plain form's shuffle partitions by user_id — a power user (a
bot emitting millions of events) serializes into one task.
:func:`sessionize_salted` is the skew-safe form, the same salted
split-then-merge pattern as the posting build: the per-event window
partitions by (user, time bucket) so a hot user's events parallelize across
buckets, and sessions crossing bucket boundaries are repaired with a second
window over PER-BUCKET SUMMARIES (one row per (user, bucket), never
per-event). Tests assert event-level equality with the plain form,
including boundary-adjacent events, ts ties, and sessions spanning many
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign (user, session_idx) by splitting on inactivity gaps > gap.

    session_idx is the running count of gap-breaks per user (1-based).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("session_idx", F.sum(is_new).over(w).cast("long"))


def sessionize_salted(
    events: DataFrame,
    gap_minutes: int = 30,
    bucket_minutes: int = 1440,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Skew-safe sessionize: identical output to :func:`sessionize`, but the
    per-event window partitions by (user, time bucket) instead of user.

    Boundary repair: per (user, bucket) emit (local session count, first ts,
    last ts); a window over these summary rows (ordered by bucket) decides
    for each bucket whether its first local session continues the previous
    bucket's last session (real-timestamp gap test, so empty buckets in
    between are handled), and prefix-sums the merged session counts into a
    global offset. An event with local index j in bucket k gets
    ``offset_k + j − merged_k`` — exact for sessions spanning any number of
    buckets (a pass-through bucket contributes n_loc − merged = 0 new
    sessions). ``bucket_minutes`` trades per-task size against summary-row
    count; correctness holds for any value."""
    gap_s = gap_minutes * 60
    span_s = bucket_minutes * 60
    ev = events.withColumn(
        "_bkt", (F.unix_timestamp(F.col(ts_col)) / F.lit(span_s)).cast("long")
    )
    wl = Window.partitionBy(user_col, "_bkt").orderBy(ts_col, id_col)
    prev_ts = F.lag(F.col(ts_col)).over(wl)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    ev = ev.withColumn("_loc", F.sum(is_new).over(wl).cast("long"))
    summary = ev.groupBy(user_col, "_bkt").agg(
        F.max("_loc").alias("_n_loc"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
    )
    wb = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_ts").over(wb)
    merged = F.when(
        prev_last.isNotNull()
        & ((F.unix_timestamp("_first_ts") - F.unix_timestamp(prev_last)) <= gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    summary = summary.withColumn("_m", merged.cast("long")).withColumn(
        "_offset",
        F.coalesce(
            F.sum(F.col("_n_loc") - F.col("_m")).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    out = ev.join(
        summary.select(user_col, "_bkt", "_m", "_offset"), [user_col, "_bkt"]
    ).withColumn(
        "session_idx", (F.col("_offset") + F.col("_loc") - F.col("_m")).cast("long")
    )
    return out.drop("_bkt", "_loc", "_m", "_offset")


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    salted: bool = False,
    bucket_minutes: int = 1440,
) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts, duration_s).
    ``salted`` routes through the skew-safe assignment (identical output)."""
    if salted:
        s = sessionize_salted(
            events, gap_minutes, bucket_minutes, user_col, ts_col, id_col
        )
    else:
        s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .cast("long")
        .alias("duration_s"),
    )
