"""Gap-based sessionization of an event stream — the standard building
block for episode grouping over user/activity logs (the reference groups
episodic context by time windows, retrieve_episodes
graphiti_core/utils/maintenance/graph_data_operations.py; gap sessions are
the corpus-scale generalization).

Scale shape: ONE window per user partition (lag + running sum over the
user's own events — per-user cardinality is bounded, user count is the
parallelism) + one algebraic aggregation for the summary. No corpus-wide
window, no driver loop. Hot users (bots) bound a single partition's work —
the usual mitigation (cap events per user upstream) composes with the
filter pushdown, but the window itself never fans out."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign a session index per user: a new session starts at the first
    event and whenever the gap to the previous event exceeds `gap_sec`
    (strictly greater — an exactly-gap_sec gap continues the session).
    Returns the input plus `session_idx` (0-based per user)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_sec * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            Window.partitionBy(user_col)
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )


def session_summary(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """(user, session_idx, n_events, start_us, end_us, duration_sec):
    per-session rollup. One window pass + one algebraic aggregation."""
    s = sessionize(events, user_col, ts_col, gap_sec)
    return s.groupBy(F.col(user_col).alias("user"), "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros(F.col(ts_col))).alias("start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("end_us"),
        F.round(
            (
                F.max(F.unix_micros(F.col(ts_col)))
                - F.min(F.unix_micros(F.col(ts_col)))
            )
            / 1_000_000.0,
            6,
        ).alias("duration_sec"),
    )
