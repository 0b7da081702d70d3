"""Hypertable-style time-series operators: fixed-width bucket rollups,
dense-spine gap-filling, and per-gap value fills (zero / LOCF / linear
interpolation).

This is the batch form of the continuous-aggregate surface TimescaleDB
calls ``time_bucket`` + ``time_bucket_gapfill`` + ``locf()`` /
``interpolate()`` — re-expressed Spark-first:

- the bucket is pure integer column arithmetic on epoch values (no UDF,
  stays inside whole-stage codegen);
- the rollup is a plain hash aggregate;
- the dense spine is ``F.sequence`` + ``explode`` over ONE row per group
  (the per-group ``[min, max]`` bucket range), so spine generation costs
  O(groups) rows in, O(groups x buckets) rows out — it never rescans the
  raw events;
- gap fills are window functions ordered by bucket within the group.

Scale shape (100 TB events): the only full-data pass is the rollup hash
aggregate. Everything after it — range agg, spine explode, left join,
fill windows — operates on the ROLLED-UP frame, whose size is bounded by
groups x (time-range / bucket width), independent of raw event volume.
The spine join and the fill windows share the (group, bucket) /
(group) partitioning, so AQE coalesces them without extra exchanges.
The reference has no time-series surface (its sync loop is one-shot
batch, `Classes/ImportService.php:71-88`); this module is part of the
analytics extension alongside the windowed streaming rollups
(`streaming/windows.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NS_PER_SEC = 10**9

__all__ = ["time_bucket", "bucket_rollup", "gapfill", "rolling"]


def time_bucket(ts: Column, bucket_seconds: int, ts_unit: str = "ns") -> Column:
    """Bucket start (epoch SECONDS, LongType) for a timestamp column.

    ``ts_unit='ns'`` takes raw epoch-nanos (LongType — how this package
    normalizes parquet TIMESTAMP(NANOS), see ``streaming/windows.py:
    ensure_nanos``); ``'s'`` takes epoch seconds. Exact integer
    arithmetic — a double division of an int64 nanos value would lose
    precision near bucket boundaries. Floor-mod (``F.pmod``), not ``%``:
    Spark's ``%`` truncates toward zero, which would snap pre-1970
    (negative-epoch) timestamps to the bucket END — floor semantics
    (``date_trunc`` / TimescaleDB ``time_bucket``) require the start on
    both sides of the epoch.
    """
    if ts_unit == "ns":
        step = F.lit(bucket_seconds * NS_PER_SEC)
        # decimal, not double, division: the bucket start (ts - pmod)
        # is an exact multiple of 1e9, but `/` on longs evaluates as
        # DOUBLE and an int64 beyond 2^62 ns (outside ~1834-2106)
        # rounds converting to double, so the quotient can land one ulp
        # below the true integer and cast("long") truncates to an
        # off-grid bucket (which gapfill's alignment check then
        # rejects). Decimal division is exact at any int64 magnitude.
        # Domain: ts >= LONG_MIN + bucket_seconds*1e9 — in the first
        # bucket above Long.MIN (year ~1677 at ns resolution) the bucket
        # START is itself unrepresentable in ns, and the subtraction
        # overflows loudly under ANSI rather than wrapping.
        n = (ts - F.pmod(ts, step)).cast("decimal(38,0)")
        return (n / F.lit(NS_PER_SEC)).cast("long")
    if ts_unit == "s":
        step = F.lit(bucket_seconds)
        return (ts - F.pmod(ts, step)).cast("long")
    raise ValueError(f"unsupported ts_unit {ts_unit!r} (expected 'ns' or 's')")


def bucket_rollup(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    group_cols: list[str],
    aggs: dict[str, Column],
    ts_unit: str = "ns",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Fixed-width bucket aggregate: one row per (group, bucket).

    ``aggs`` maps output column name -> aggregate Column. One hash
    aggregate over the raw frame — partial (map-side) combine applies,
    so the shuffle carries one row per (group, bucket) per input
    partition, not per event.
    """
    bucket = time_bucket(F.col(ts_col), bucket_seconds, ts_unit)
    return df.groupBy(*group_cols, bucket.alias(bucket_col)).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def gapfill(
    rolled: DataFrame,
    bucket_seconds: int,
    group_cols: list[str],
    fills: dict[str, str],
    bucket_col: str = "bucket",
    bucket_range: tuple[int, int] | None = None,
    validate: bool = False,
) -> DataFrame:
    """Densify a bucket rollup over each group's [min, max] bucket range
    and fill the introduced NULLs.

    ``bucket_range=(start, end)`` aligns EVERY group to the same
    inclusive bucket span instead of its own observed range — required
    when downstream logic joins or unions across groups and assumes a
    shared grid (cross-series correlation, matrix pivots). Buckets
    outside a group's observations fill by the same strategies
    (leading LOCF stays NULL; linear clamps to the boundary values).

    Input contract: ``rolled`` must have AT MOST ONE row per
    (group, bucket) — i.e. be the output of :func:`bucket_rollup` or an
    equivalent aggregate. A duplicated bucket would survive the spine
    left join as duplicate dense rows and silently skew every
    window-based fill downstream, so this is validated eagerly when
    ``validate=True`` (one cheap aggregate over the already-rolled
    frame — input size is groups x buckets, not raw events; pass
    ``validate=False`` only when the input provably comes straight
    from ``bucket_rollup``).

    ``fills`` maps column name -> fill strategy:

    - ``'zero'``   — ``coalesce(col, 0)`` (counts / sums of events);
    - ``'locf'``   — last observation carried forward (gauges); leading
      NULLs (before the first observation) stay NULL;
    - ``'linear'`` — linear interpolation between the nearest observed
      buckets on either side; before the first / after the last
      observation the boundary value is carried (matches TimescaleDB's
      ``interpolate`` clamped to the observed range);
    - ``'none'``   — keep the NULL (the row still appears).

    Columns not named in ``fills`` are kept as-is (NULL in gap rows).

    The spine is built from ONE aggregated row per group (min/max
    bucket), exploded via ``F.sequence`` — O(groups) input rows. The
    left join back to ``rolled`` shuffles both sides on
    (group, bucket); the fill windows then re-use a (group)-hash
    partitioning. Window state per task is bounded by the group's spine
    length (time-range / bucket width), not by raw event volume.
    """
    if validate:
        dup = (
            rolled.groupBy(*group_cols, bucket_col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .limit(1)
            .collect()  # one row max: contract check, not a data read
        )
        if dup:
            raise ValueError(
                f"gapfill input has duplicate (group, {bucket_col}) rows "
                f"(e.g. {tuple(dup[0])[:-1]}); pass the output of "
                "bucket_rollup"
            )
    step = F.lit(int(bucket_seconds))
    if bucket_range is None:
        ranges = rolled.groupBy(*group_cols).agg(
            F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
        )
    else:
        start, end = bucket_range
        if end < start:
            raise ValueError(f"bucket_range end {end} < start {start}")
        # Bucket values produced by time_bucket are floor(ts/step)*step —
        # exact multiples of bucket_seconds. A bucket_range start that is
        # not on that grid would build a spine matching NO observed bucket:
        # the left join nulls every row and the fills fabricate a fully-gap
        # series with no error. Fail loudly instead (Python % is floor-mod,
        # so the check is consistent for negative epochs too).
        misaligned = [
            v for v in (start, end) if int(v) % int(bucket_seconds) != 0
        ]
        if misaligned:
            raise ValueError(
                f"bucket_range value(s) {misaligned} are not aligned to the "
                f"{bucket_seconds}s bucket grid (bucket values are multiples "
                f"of bucket_seconds); snap start down with "
                f"start - start % bucket_seconds"
            )
        ranges = (
            rolled.select(*group_cols)
            .distinct()
            .select(
                *group_cols,
                F.lit(int(start)).cast("long").alias("_mn"),
                F.lit(int(end)).cast("long").alias("_mx"),
            )
        )
    spine = ranges.select(
        *group_cols,
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"), step)).alias(bucket_col),
    )
    dense = spine.join(rolled, on=[*group_cols, bucket_col], how="left")

    order = F.col(bucket_col).asc()
    w_back = (
        Window.partitionBy(*group_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*group_cols)
        .orderBy(order)
        .rowsBetween(0, Window.unboundedFollowing)
    )

    out = dense
    for name, how in fills.items():
        col = F.col(name)
        if how == "none":
            continue
        if how == "zero":
            out = out.withColumn(name, F.coalesce(col, F.lit(0)))
        elif how == "locf":
            out = out.withColumn(name, F.last(col, ignorenulls=True).over(w_back))
        elif how == "linear":
            prev_v = F.last(col, ignorenulls=True).over(w_back)
            prev_b = F.last(
                F.when(col.isNotNull(), F.col(bucket_col)), ignorenulls=True
            ).over(w_back)
            next_v = F.first(col, ignorenulls=True).over(w_fwd)
            next_b = F.first(
                F.when(col.isNotNull(), F.col(bucket_col)), ignorenulls=True
            ).over(w_fwd)
            interp = prev_v + (next_v - prev_v) * (
                (F.col(bucket_col) - prev_b) / (next_b - prev_b)
            )
            out = out.withColumn(
                name,
                F.when(col.isNotNull(), col)
                .when(prev_v.isNull(), next_v)
                .when(next_v.isNull(), prev_v)
                .otherwise(interp),
            )
        else:
            raise ValueError(f"unknown fill strategy {how!r} for column {name!r}")
    return out


def rolling(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Trailing-window aggregates over a (gap-filled) bucket grid: each
    row gets ``aggs`` evaluated over the last ``n_buckets`` rows of its
    group (current bucket inclusive), e.g. a 24-bucket moving average.

    Row-frame semantics (``ROWS n-1 PRECEDING .. CURRENT ROW``), which
    equals time-range semantics exactly when the input grid is dense —
    run :func:`gapfill` first; on a sparse frame the window would span
    variable time. One sort per group partition, state bounded by
    ``n_buckets`` — the aggregate buffer slides, it does not grow with
    the group. Same (group) partitioning as the gapfill windows, so
    chaining adds no exchange.

    ``aggs`` are applied in dict order via ``withColumn``: an agg whose
    NAME collides with an input column replaces it, and later aggs then
    see the windowed values — name outputs distinctly (``v_24h``, not
    ``v``) unless that shadowing is intended.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-(n_buckets - 1), 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
