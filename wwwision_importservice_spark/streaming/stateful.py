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
a full deployment. Its Python state server requires ``google.protobuf``,
which this container does not ship, so the TWS form is wired behind a
runtime probe (:func:`tws_available` / :func:`running_totals_tws`) the
same way the Kafka source is: it raises a clear error here and runs on
any deployment with protobuf installed, while the
``applyInPandasWithState`` forms below are the semantically equivalent
default running on the HDFS-backed state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def parse_ttl_ms(ttl: str) -> int:
    """Parse a human TTL ("5 ms", "90 seconds", "1 hour") to millis.

    Unit resolution normalizes the matched word BEFORE the first-letter
    lookup — "millisecond(s)" starts with 'm' and would otherwise
    silently resolve to minutes (a 60000x mis-scale)."""
    import re as _re

    m = _re.fullmatch(
        r"\s*(\d+)\s*(ms|milliseconds?|s|seconds?|m|minutes?|h|hours?|d|days?)\s*",
        ttl,
    )
    if not m:
        raise ValueError(f'Unparseable ttl "{ttl}"')
    u = m.group(2)
    key = "ms" if u == "ms" or u.startswith("milli") else u[0]
    unit = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}[key]
    return int(m.group(1)) * unit


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
    ttl: str | None = None,
) -> DataFrame:
    """Cross-batch exact dedup: emit a key the FIRST time it is ever
    seen; suppress it in every later batch (the streaming complement of
    batch K1 keying — state is the seen-key set, sharded by key).

    ``ttl`` (e.g. ``"1 hour"``): processing-time expiry of seen-keys.
    Without it, state is O(all keys ever seen) — unbounded on an
    unbounded stream; with it, state is O(keys seen within the TTL) and
    a key re-arriving after expiry is emitted again (the standard
    exactness-for-memory trade every at-scale dedup makes)."""
    out_schema = f"{key_col} string, first_batch boolean"
    state_schema = "seen boolean"
    ttl_ms = None if ttl is None else parse_ttl_ms(ttl)

    def update(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            # expiry callback: drop the seen-mark; the key dedups afresh
            state.remove()
            return
        rows = sum(len(pdf) for pdf in pdf_iter)
        if rows == 0:
            return
        already = state.exists
        if ttl_ms is not None:
            # (re)arm the expiry clock on every sighting, whether or not
            # we emit — state must outlive the LAST arrival by the TTL
            if not already:
                state.update((True,))
            state.setTimeoutDuration(ttl_ms)
        elif not already:
            state.update((True,))
        if already:
            return  # seen in an earlier batch → suppress
        yield pd.DataFrame({key_col: [key[0]], "first_batch": [True]})

    return stream_df.select(key_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def tws_available() -> bool:
    """True when Spark 4's transformWithStateInPandas can actually run:
    the StatefulProcessor API exists AND google.protobuf (its Python
    state-server dependency, not bundled with pyspark) imports."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except ImportError:
        return False


def running_totals_tws(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`running_totals` —
    same semantics through Spark 4's StatefulProcessor API (ValueState
    handle instead of the single GroupState blob; timers/TTL available
    for state eviction on real deployments). Raises with installation
    guidance when the protobuf dependency is absent; the probe +
    skip-marked test mirror the Kafka source pattern."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (the "
            "TWS Python state server dependency); pip install protobuf, "
            "or use running_totals (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} long, n_events long, total_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
