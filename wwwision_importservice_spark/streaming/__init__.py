"""Structured Streaming extension (SURVEY §2.8, §7.1.8).

The reference is one-shot batch (``Classes/ImportService.php:71-88``);
its diff-and-apply semantics port directly to Structured Streaming: each
micro-batch is one ``importData`` run against current target state
(``foreachBatch`` + the batch diff kernel). Windowed/sessionized rollups
and custom stateful operators are the driver-mandated scale extensions.
"""

from wwwision_importservice_spark.streaming.stateful import (
    first_seen_dedup,
    running_totals,
    version_gate,
)
from wwwision_importservice_spark.streaming.sync import stream_sync
from wwwision_importservice_spark.streaming.windows import (
    nanos_to_timestamp,
    session_rollup,
    sliding_rollup,
    tumbling_rollup,
)

__all__ = [
    "first_seen_dedup",
    "nanos_to_timestamp",
    "running_totals",
    "version_gate",
    "session_rollup",
    "sliding_rollup",
    "stream_sync",
    "tumbling_rollup",
]
