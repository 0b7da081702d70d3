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
live smoke tests). **Kafka** needs the ``spark-sql-kafka-0-10`` package
on the classpath — not shipped in this environment, so it is documented
rather than built:

    spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "...")
        .option("subscribe", "events")
        .load()                       # key/value binary + topic metadata
        .select(F.from_json(F.col("value").cast("string"), schema).alias("r"))
        .select("r.*")

From there the same ``stream_sync`` / rollup / stateful operators apply
unchanged; checkpointing and exactly-once sink semantics are the
standard Structured Streaming contracts.
"""

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
    "nanos_to_timestamp",
    "rate_events",
    "running_totals",
    "version_gate",
    "session_rollup",
    "sliding_rollup",
    "stream_sync",
    "tumbling_rollup",
]
