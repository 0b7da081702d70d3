"""Structured Streaming extension (SURVEY §2.8, §7.1.8).

The reference is one-shot batch (``Classes/ImportService.php:71-88``);
its diff-and-apply semantics port directly to Structured Streaming: each
micro-batch is one ``importData`` run against current target state
(``foreachBatch`` + the batch diff kernel). Windowed/sessionized rollups
and custom stateful operators are the driver-mandated scale extensions.

Sources: every operator here takes a plain streaming DataFrame, so the
source is a one-line swap. Built-in (no extra jars): file-directory
streams (``readStream.schema(...).parquet/json/csv``) and the ``rate``
source (:func:`rate_events` wraps it as a synthetic event stream for
live smoke tests). **Kafka** is wired in :mod:`.kafka`
(``kafka_events`` — JSON value decode to the events schema) behind a
runtime classpath probe (``kafka_available``): the
``spark-sql-kafka-0-10`` connector is not bundled with pyspark, so the
integration test skips cleanly when the jar is absent (one
``spark.jars.packages`` line adds it — see the module docstring).

From there the same ``stream_sync`` / rollup / stateful operators apply
unchanged; checkpointing and exactly-once sink semantics are the
standard Structured Streaming contracts.
"""

from wwwision_importservice_spark.streaming.kafka import (
    kafka_available,
    kafka_events,
)
from wwwision_importservice_spark.streaming.rate import rate_events
from wwwision_importservice_spark.streaming.stateful import (
    first_seen_dedup,
    running_totals,
    version_gate,
)
from wwwision_importservice_spark.streaming.sync import stream_sync
from wwwision_importservice_spark.streaming.windows import (
    ensure_nanos,
    nanos_to_timestamp,
    session_rollup,
    sliding_rollup,
    tumbling_rollup,
)

__all__ = [
    "ensure_nanos",
    "first_seen_dedup",
    "kafka_available",
    "kafka_events",
    "nanos_to_timestamp",
    "rate_events",
    "running_totals",
    "version_gate",
    "session_rollup",
    "sliding_rollup",
    "stream_sync",
    "tumbling_rollup",
]
