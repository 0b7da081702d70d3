"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful surface (SURVEY §2.8); these are the
driver-mandated extension shapes for operators Spark's built-in windowed
aggregates can't express: running per-key totals across micro-batches,
cross-batch first-seen dedup, and the streaming version gate (the J3
update predicate as cross-batch state).

Scale notes: state lives in the state store partitioned by key — the
shuffle is on the grouping key, state size is O(distinct keys), and a
timeout (GroupStateTimeout) bounds it for expiring key spaces. Closures
are self-contained (plain-value captures, imports inside) so cloudpickle
ships them by value and executors never import this package.

``transformWithStateInPandas`` (Spark 4's StatefulProcessor API —
ValueState/ListState/MapState handles, timers, TTL) is the successor to
``applyInPandasWithState`` and the natural home for these operators on
a full deployment; it is NOT used here because its Python state server
requires ``google.protobuf``, which this container does not ship
(verified: the streaming runner dies with ``ImportError: cannot import
name 'descriptor' from 'google.protobuf'`` on query start, regardless
of the RocksDB state-store provider being available). The
``applyInPandasWithState`` forms below are semantically equivalent for
these operators and run on the default HDFS-backed state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def version_gate(
    stream_df: DataFrame,
    key_col: str,
    version_col: str,
) -> DataFrame:
    """Streaming J3 — the update predicate as cross-batch state: emit a
    record iff its version is strictly newer than the newest version
    ever seen for its key (first sighting always emits), then advance
    the stored high-water mark. Stale and duplicate versions are
    suppressed even when they arrive in later micro-batches — the
    at-least-once upstream becomes effectively-newest downstream.

    Within one batch, rows are processed in version order so an
    out-of-order batch emits only the record(s) that actually advance
    the mark (reference predicate ``DbalTarget.php:106-116``, minus the
    NULL branches: unversioned streams belong in foreachBatch sync).
    """
    out_schema = f"{key_col} string, {version_col} long"
    state_schema = "max_version long"

    def update(key, pdf_iter, state):
        import pandas as pd

        best = state.get[0] if state.exists else None
        emitted = []
        for pdf in pdf_iter:
            for v in pdf[version_col].sort_values():
                v = int(v)
                if best is None or v > best:
                    best = v
                    emitted.append(v)
        if emitted:
            state.update((best,))
            yield pd.DataFrame(
                {key_col: [key[0]] * len(emitted), version_col: emitted}
            )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias(key_col), version_col
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
