"""Event sessionization (gap-based) — the batch window-function twin of the
streaming session_window; part of the engine's analytics operator surface
(the reference has no window functions at all, SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user; return per-session rollups.

    Deterministic ordering (ts, event_id); a session breaks when the gap to
    the previous event exceeds ``gap_seconds``.  Output:
    (user_id, session_id, n_events, start_s, end_s) with epoch-second bounds.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_sid = events.withColumn("session_id", F.sum(new_s).over(run))
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("start_s"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("end_s"),
        )
    )
