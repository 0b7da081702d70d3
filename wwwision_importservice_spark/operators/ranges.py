"""Bucketed range (interval) join — points matched into time intervals.

No reference counterpart (only keyed equi-joins there, SURVEY §2.4);
this is the temporal-join scale pattern: joining a point stream to an
interval set on ``start <= ts < end`` is a theta join, which Spark
plans as a broadcast-nested-loop (or worse, a cartesian) — O(|P|·|I|)
comparisons. Bucketizing time turns it into an EQUI-join:

- choose ``bucket_width`` ≥ the longest interval,
- each interval replicates to the buckets it overlaps (≤ 2 when the
  width bound holds, fixed (len/width)+1 otherwise),
- points join on (key, bucket), then the exact range predicate filters.

One hash-partitioned shuffle over |P| + ~2|I| rows; the residual filter
is a codegen'd comparison. This is the same trick behind Databricks'
range-join optimization and interval libraries generally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same keys) with
    ``start <= ts < end`` (half-open).

    ``ts/start/end`` are numeric (epoch seconds/micros/nanos — any
    consistent unit); ``bucket_width`` in the same unit, ideally ≥ the
    longest interval so each interval lands in at most 2 buckets.
    Output: all point columns + all interval columns.
    """
    pt_bucket = (F.col(ts_col) - F.col(ts_col) % bucket_width).cast("long")
    # explicit frame aliases: points and intervals often derive from the
    # SAME source (event self-join), where p[k] == i[k] resolves both
    # sides to one attribute — Spark warns "trivially true predicate"
    # and correctness then hangs on its self-join disambiguation
    p = points.withColumn("__bkt", pt_bucket).alias("__p")

    first_b = (F.col(start_col) - F.col(start_col) % bucket_width).cast("long")
    # half-open end: an interval ending exactly on a bucket boundary does
    # not reach into that bucket
    last_b = (
        (F.col(end_col) - 1) - (F.col(end_col) - 1) % bucket_width
    ).cast("long")
    buckets = F.sequence(first_b, F.greatest(last_b, first_b), F.lit(bucket_width))
    i = intervals.withColumn("__bkt", F.explode(buckets)).alias("__i")

    if how != "inner":
        raise ValueError("only inner interval joins are implemented")
    on = [F.col(f"__p.{k}") == F.col(f"__i.{k}") for k in key_cols] + [
        F.col("__p.__bkt") == F.col("__i.__bkt")
    ]
    cond = (F.col(f"__i.{start_col}") <= F.col(f"__p.{ts_col}")) & (
        F.col(f"__p.{ts_col}") < F.col(f"__i.{end_col}")
    )
    joined = p.join(i, [*on, cond], "inner")
    keep = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}") for c in intervals.columns if c not in (*key_cols,)
    ]
    return joined.select(*keep)
