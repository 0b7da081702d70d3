"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful surface (SURVEY §2.8); these are the
driver-mandated extension shapes for operators Spark's built-in windowed
aggregates can't express: running per-key totals across micro-batches
and cross-batch first-seen dedup.

Scale notes: state lives in the state store partitioned by key — the
shuffle is on the grouping key, state size is O(distinct keys), and a
timeout (GroupStateTimeout) bounds it for expiring key spaces. Closures
are self-contained (plain-value captures, imports inside) so cloudpickle
ships them by value and executors never import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def running_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Running (count, sum) per key across ALL micro-batches seen so far.

    Unlike a windowed aggregate, state never finalizes — each batch emits
    the updated lifetime totals for keys present in the batch.
    """
    out_schema = f"{key_col} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_dedup(
    stream_df: DataFrame,
    key_col: str,
) -> DataFrame:
    """Cross-batch exact dedup: emit a key the FIRST time it is ever
    seen; suppress it in every later batch (the streaming complement of
    batch K1 keying — state is the seen-key set, sharded by key)."""
    out_schema = f"{key_col} string, first_batch boolean"
    state_schema = "seen boolean"

    def update(key, pdf_iter, state):
        import pandas as pd

        rows = sum(len(pdf) for pdf in pdf_iter)
        if rows == 0:
            return
        if state.exists:
            return  # seen in an earlier batch → suppress
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "first_batch": [True]})

    return stream_df.select(key_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
