"""Per-event session assignment (batch gaps-and-islands).

``F.session_window`` aggregates per session; this operator instead
LABELS every event with its session — the shape needed when downstream
work is per-event (feature extraction, attribution) rather than
per-session rollup.

Classic gaps-and-islands: a new session starts where the gap to the
previous event (per key, by time) is ≥ ``gap``; the session id is the
running count of session starts. One shuffle on the key + per-key sort
(two window functions over the same window spec share the sort).
Session identity = (key, session_seq) — stable within a run; for a
cross-run-stable id use the session's start timestamp (also emitted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: int,
    session_col: str = "session_seq",
) -> DataFrame:
    """Label each row with its session sequence number (1-based per key)
    and the session's start timestamp.

    ``gap`` is in the units of ``ts_col`` (numeric). An event exactly
    ``gap`` after its predecessor starts a NEW session (half-open,
    matching ``F.session_window`` semantics).
    """
    order = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(order)
    is_start = (prev_ts.isNull() | (F.col(ts_col) - prev_ts >= gap)).cast("int")
    running = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_seq = df.withColumn(session_col, F.sum(is_start).over(running))
    start_w = Window.partitionBy(*key_cols, session_col)
    return with_seq.withColumn("session_start", F.min(F.col(ts_col)).over(start_w))
