"""Sessionization over event streams — gap-based session assignment as
window functions (lag + running sum), the standard large-pipeline shape for
activity logs.

Spark-first: one shuffle on user_id (the window partition key), everything
else inside whole-stage codegen. The total order within a user is pinned as
(ts, event_id) so session numbering is deterministic under ts ties. At
100 TB the shuffle partitions by user_id (high cardinality, mild skew); a
power-user hot key would be salted by day before the window, same pattern as
the posting build's salted runs.
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


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts, duration_s)."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .cast("long")
        .alias("duration_s"),
    )
