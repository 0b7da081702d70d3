"""Synthetic live event stream over Spark's built-in ``rate`` source.

The ``rate`` source ships with Spark (no extra jars, unlike Kafka) and
emits ``(timestamp, value)`` at a configured rows/second — the standard
way to smoke-test a streaming topology against a genuinely unbounded
source before pointing it at Kafka. :func:`rate_events` shapes it like
the ``events`` testdata table (deterministic event_type/user_id/value
derived from the monotonically increasing counter), so every rollup and
stateful operator in this package runs on it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ["view", "click", "purchase"]


def rate_events(
    spark: SparkSession,
    rows_per_second: int = 100,
    n_users: int = 50,
) -> DataFrame:
    """An unbounded events-shaped stream: ``event_id, user_id,
    event_type, ts, value`` — all derived deterministically from the
    rate counter, so repeated runs at the same offsets see the same
    records (replays after a checkpoint recovery stay consistent)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    v = F.col("value")
    event_type = (
        F.when(v % 10 < 6, F.lit(EVENT_TYPES[0]))
        .when(v % 10 < 9, F.lit(EVENT_TYPES[1]))
        .otherwise(F.lit(EVENT_TYPES[2]))
    )
    return rate.select(
        v.alias("event_id"),
        (v % n_users).alias("user_id"),
        event_type.alias("event_type"),
        F.col("timestamp").alias("ts"),
        ((v % 997).cast("double") / 10).alias("value"),
    )
