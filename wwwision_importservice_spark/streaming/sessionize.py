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



def sessionize_stream(
    stream_df,
    id_col: str,
    key_col: str,
    ts_col: str,
    gap: int,
):
    """Streaming twin of :func:`~wwwision_importservice_spark.streaming.
    sessionize.sessionize`: label every event with its (session_seq,
    session_start) across micro-batches via per-key state
    ``(last_ts, session_seq, session_start)``.

    Within a batch, a key's events are processed in ``ts`` order; state
    carries the running session across batch boundaries, so a session
    spanning many micro-batches keeps one (seq, start) identity. An
    event arriving LATE (ts older than the state's last_ts) joins the
    current session rather than rewriting history — per-event labels
    can't be retracted once emitted; bound the damage upstream with a
    watermark + drop, exactly like every at-scale streaming labeler.
    State is O(keys), three longs per key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{id_col} long, {key_col} long, {ts_col} long, "
        "session_seq long, session_start long"
    )
    state_schema = "last_ts long, seq long, start long"

    def update(key, pdf_iter, state):
        import pandas as pd

        last, seq, start = state.get if state.exists else (None, 0, None)
        ids, tss, seqs, starts = [], [], [], []
        # Arrow hands LARGE groups to this function as MULTIPLE chunks
        # (maxRecordsPerBatch ~10k) with no cross-chunk ordering — a
        # per-chunk sort would break the "ts order within a batch"
        # contract and mislabel events as late. Materialize the whole
        # group (O(group) memory — inherent to any per-key sort) and
        # sort ONCE.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            for row in whole.itertuples(index=False):
                t = int(getattr(row, ts_col))
                if last is None or t - last >= gap:
                    seq += 1
                    start = t
                last = max(t, last) if last is not None else t
                ids.append(int(getattr(row, id_col)))
                tss.append(t)
                seqs.append(seq)
                starts.append(start)
        if not ids:
            return
        state.update((last, seq, start))
        yield pd.DataFrame(
            {
                id_col: ids,
                key_col: [key[0]] * len(ids),
                ts_col: tss,
                "session_seq": seqs,
                "session_start": starts,
            }
        )

    return (
        stream_df.select(id_col, key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
