"""Windowed event rollups: tumbling, sliding, session.

No counterpart in the reference (SURVEY §1.4: no streaming, no
time-series surface) — this is the driver-mandated extension for the
``events`` stream table, built on Spark's native window operators so the
SAME code path serves batch DataFrames (oracle-checkable) and streaming
DataFrames (with a watermark for state eviction).

Scale notes:
- ``F.window``/``F.session_window`` group-bys are hash aggregates with
  map-side partial aggregation — one shuffle on (key, window).
- In streaming mode the watermark bounds state: windows older than
  max(event time) − watermark are finalized and dropped. Without it a
  100 TB/day stream accretes state forever.
- Aggregation columns use decimal-exact sums cast to double at the end
  (deterministic vs accumulation order, hash-match vs the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_nanos(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a time column to raw epoch-nanoseconds (LongType).

    The driver testdata has shipped ``events.ts`` both as parquet
    TIMESTAMP(NANOS) (arrives as long via ``nanosAsLong``) and as
    TIMESTAMP(MICROS) (arrives as timestamp / timestamp_ntz). Every
    operator downstream consumes raw nanos, so the read path funnels
    through this converter: timestamps become ``unix_micros * 1000``
    (exact — µs precision carries three trailing zero nanos), longs pass
    through untouched. The ntz→timestamp cast is wall-clock-preserving
    under the UTC session timezone the package pins at read time.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype in ("timestamp", "timestamp_ntz"):
        return df.withColumn(
            col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)
        )
    return df


def nanos_to_timestamp(col: Column | str) -> Column:
    """Raw int64 nanoseconds → TimestampType (µs precision).

    The driver testdata's ``events.ts`` is parquet TIMESTAMP(NANOS),
    surfaced as LongType via ``spark.sql.legacy.parquet.nanosAsLong``.
    The division must be exact-integer: ``/`` on longs goes through
    double, and an int64 epoch-nanos (~1.7e18) exceeds double's 2^53
    integer range — truncation would be off by ±1 µs. Decimal division
    keeps it exact (truncating, matching DuckDB's ns→µs read path).
    """
    c = F.col(col) if isinstance(col, str) else col
    micros = (c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def _agg_exprs(value_col: str | None) -> list[Column]:
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return aggs


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    *,
    window: str = "1 hour",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (key, window).

    Output: keys + ``window_start_us``/``window_end_us`` (epoch µs,
    exact integers for oracle comparison) + counts/sums.
    """
    src = _maybe_watermark(df, ts_col, watermark)
    grouped = src.groupBy(F.window(ts_col, window).alias("__w"), *keys)
    return grouped.agg(*_agg_exprs(value_col)).select(
        *keys,
        F.unix_micros(F.col("__w.start")).alias("window_start_us"),
        F.unix_micros(F.col("__w.end")).alias("window_end_us"),
        "n_events",
        *(["sum_value"] if value_col else []),
    )


def sliding_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows every ``slide``: each event lands in
    window/slide buckets (Spark expands rows before the hash agg)."""
    src = _maybe_watermark(df, ts_col, watermark)
    grouped = src.groupBy(F.window(ts_col, window, slide).alias("__w"), *keys)
    return grouped.agg(*_agg_exprs(value_col)).select(
        *keys,
        F.unix_micros(F.col("__w.start")).alias("window_start_us"),
        F.unix_micros(F.col("__w.end")).alias("window_end_us"),
        "n_events",
        *(["sum_value"] if value_col else []),
    )


def session_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    *,
    gap: str = "30 minutes",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: per key, events closer than ``gap`` merge into
    one session; ``session_end = last event + gap`` (half-open).

    In streaming mode session windows REQUIRE a watermark (state must be
    finalizable); in batch mode it's a plain dynamic-gap aggregation.
    """
    src = _maybe_watermark(df, ts_col, watermark)
    grouped = src.groupBy(F.session_window(ts_col, gap).alias("__w"), *keys)
    return grouped.agg(*_agg_exprs(value_col)).select(
        *keys,
        F.unix_micros(F.col("__w.start")).alias("session_start_us"),
        F.unix_micros(F.col("__w.end")).alias("session_end_us"),
        "n_events",
        *(["sum_value"] if value_col else []),
    )
