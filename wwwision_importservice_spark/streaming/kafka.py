"""Kafka streaming source — a one-line format swap, wired for real.

The reference has no streaming surface (SURVEY §1.4); this is the
driver-mandated extension's production source. Every operator in this
package takes a plain streaming DataFrame, so Kafka versus file/rate is
only the read side: ``kafka_events`` decodes the Kafka value envelope
(JSON bytes) into the events schema and everything downstream
(``stream_sync``, rollups, stateful ops) applies unchanged.

Classpath: the ``spark-sql-kafka-0-10`` connector is NOT bundled with
pyspark. One line at session build time::

    SparkSession.builder.config(
        "spark.jars.packages",
        "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>",
    )

``kafka_available()`` probes the classpath at runtime so callers (and
the integration test) can skip cleanly instead of failing mid-plan when
the jar is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType | str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """An unbounded stream of JSON-encoded records from a Kafka topic,
    decoded to ``schema`` — the production twin of ``rate_events``.

    Returns the decoded frame only; Kafka metadata (partition/offset) is
    deliberately dropped so the result is source-agnostic. Offsets and
    exactly-once delivery are the standard Structured Streaming
    contracts via the query's checkpoint location.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 connector on "
            "the classpath; add spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")
