"""Unit tests for operators/timeseries.py (bucket rollup + gapfill)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wwwision_importservice_spark.operators.timeseries import (
    bucket_rollup,
    gapfill,
    time_bucket,
)


def _rolled(spark):
    # Buckets 0, 10, 40 observed for group 'a' (gaps at 20, 30);
    # single-bucket group 'b'. Values chosen so linear interpolation
    # lands on exact doubles.
    rows = [
        ("a", 0, 1.0),
        ("a", 5, 3.0),
        ("a", 10, 10.0),
        ("a", 40, 40.0),
        ("b", 25, 7.0),
    ]
    df = spark.createDataFrame(rows, ["g", "ts_s", "v"])
    return bucket_rollup(
        df,
        "ts_s",
        10,
        ["g"],
        {"n": F.count(F.lit(1)), "v": F.max("v")},
        ts_unit="s",
    )


def test_time_bucket_ns_integer_exact(spark):
    # 1 ns before the boundary stays in the previous hour; the boundary
    # itself starts the next — exact int64 arithmetic, no double rounding.
    ns_hour = 3600 * 10**9
    df = spark.createDataFrame(
        [(ns_hour - 1,), (ns_hour,)], ["ts"]
    ).select(time_bucket(F.col("ts"), 3600).alias("b"))
    assert [r.b for r in df.orderBy("b").collect()] == [0, 3600]


def test_time_bucket_negative_epoch_floors(spark):
    # pre-1970 timestamps must bucket to the interval START (floor
    # semantics, like date_trunc / TimescaleDB time_bucket). Spark's %
    # truncates toward zero, which would snap them to the bucket END —
    # time_bucket uses pmod so both signs floor (r7 ADVICE fix).
    df = spark.createDataFrame(
        [(-1,), (-3600,), (-3601,), (0,), (1,)], ["ts"]
    ).select(
        F.col("ts"), time_bucket(F.col("ts"), 3600, ts_unit="s").alias("b")
    )
    got = {r.ts: r.b for r in df.collect()}
    assert got == {-1: -3600, -3600: -3600, -3601: -7200, 0: 0, 1: 0}
    # and the ns path, exact at the int64 boundary
    ns = 3600 * 10**9
    df_ns = spark.createDataFrame([(-1,), (-ns,)], ["ts"]).select(
        F.col("ts"), time_bucket(F.col("ts"), 3600).alias("b")
    )
    assert {r.ts: r.b for r in df_ns.collect()} == {-1: -3600, -ns: -3600}


def test_gapfill_rejects_misaligned_bucket_range(spark):
    # a start off the bucket grid would spine-join against nothing and
    # fabricate a fully-gap series — it must raise instead (r7 ADVICE)
    with pytest.raises(ValueError, match="not aligned"):
        gapfill(
            _rolled(spark), 10, ["g"], {"n": "zero"}, bucket_range=(5, 45)
        )
    with pytest.raises(ValueError, match="not aligned"):
        gapfill(
            _rolled(spark), 10, ["g"], {"n": "zero"}, bucket_range=(0, 42)
        )
    # negative-but-aligned is fine (floor-mod check)
    out = gapfill(
        _rolled(spark), 10, ["g"], {"n": "zero"}, bucket_range=(-10, 40)
    )
    assert out.count() == 12  # 2 groups x 6 buckets


def test_gapfill_zero_and_locf(spark):
    out = gapfill(
        _rolled(spark), 10, ["g"], {"n": "zero", "v": "locf"}, bucket_col="bucket"
    )
    rows = {(r.g, r.bucket): (r.n, r.v) for r in out.collect()}
    # group a: dense 0..40; gaps zero-filled / carried
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 20)] == (0, 10.0)
    assert rows[("a", 30)] == (0, 10.0)
    assert rows[("a", 40)] == (1, 40.0)
    # single-bucket group: spine collapses to the one observed bucket
    assert rows[("b", 20)] == (1, 7.0)
    assert len(rows) == 6


def test_gapfill_linear_and_none(spark):
    out = gapfill(
        _rolled(spark), 10, ["g"], {"v": "linear", "n": "none"}, bucket_col="bucket"
    )
    rows = {(r.g, r.bucket): (r.n, r.v) for r in out.collect()}
    # straight line between (10, 10.0) and (40, 40.0)
    assert rows[("a", 20)] == (None, 20.0)
    assert rows[("a", 30)] == (None, 30.0)
    assert rows[("a", 0)][1] == 3.0  # observed value untouched


def test_gapfill_linear_boundary_carries_edges(spark):
    # leading/trailing gaps clamp to the nearest observed value
    df = spark.createDataFrame(
        [("a", 10, None), ("a", 20, 5.0), ("a", 40, None)],
        "g string, bucket long, v double",
    )
    out = gapfill(df, 10, ["g"], {"v": "linear"}, bucket_col="bucket")
    rows = {r.bucket: r.v for r in out.collect()}
    assert rows == {10: 5.0, 20: 5.0, 30: 5.0, 40: 5.0}


def test_gapfill_global_bucket_range_aligns_groups(spark):
    # explicit (start, end): every group shares the same grid, buckets
    # outside a group's observations included (LOCF leaves leading NULL)
    out = gapfill(
        _rolled(spark),
        10,
        ["g"],
        {"n": "zero", "v": "locf"},
        bucket_col="bucket",
        bucket_range=(0, 40),
    )
    rows = {(r.g, r.bucket): (r.n, r.v) for r in out.collect()}
    assert len(rows) == 10  # 2 groups x 5 aligned buckets
    assert rows[("b", 0)] == (0, None)  # before b's first observation
    assert rows[("b", 30)] == (0, 7.0)  # carried past it
    with pytest.raises(ValueError, match="bucket_range"):
        gapfill(_rolled(spark), 10, ["g"], {}, bucket_range=(40, 0))


def test_rolling_trailing_window(spark):
    from wwwision_importservice_spark.operators.timeseries import rolling

    df = spark.createDataFrame(
        [("a", b, v) for b, v in [(0, 1), (10, 2), (20, 4), (30, 8)]],
        "g string, bucket long, v long",
    )
    out = rolling(df, ["g"], {"s3": F.sum("v"), "n3": F.count(F.lit(1))}, 3)
    rows = {r.bucket: (r.s3, r.n3) for r in out.collect()}
    # trailing 3-bucket sums; ramp-up rows have shorter windows
    assert rows == {0: (1, 1), 10: (3, 2), 20: (7, 3), 30: (14, 3)}


def test_rolling_rejects_empty_window(spark):
    from wwwision_importservice_spark.operators.timeseries import rolling

    df = spark.createDataFrame([("a", 0, 1)], "g string, bucket long, v long")
    with pytest.raises(ValueError, match="n_buckets"):
        rolling(df, ["g"], {"s": F.sum("v")}, 0)


def test_gapfill_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError, match="unknown fill strategy"):
        gapfill(_rolled(spark), 10, ["g"], {"v": "nearest"}).collect()
    with pytest.raises(ValueError, match="ts_unit"):
        time_bucket(F.col("x"), 10, ts_unit="ms")


def test_gapfill_validate_rejects_unrolled_input(spark):
    # a raw (non-aggregated) frame with duplicate buckets is the
    # documented contract violation: silent duplicate dense rows
    raw = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 0, 2.0), ("a", 10, 3.0)],
        "g string, bucket long, v double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        gapfill(raw, 10, ["g"], {"v": "locf"}, validate=True)
    # the rolled fixture passes validation and fills normally
    out = gapfill(_rolled(spark), 10, ["g"], {"v": "locf"}, validate=True)
    assert out.count() == 6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gapfill_matches_pandas_model(spark, seed):
    """Differential vs an independent pandas reference: seeded random
    sparse (group, bucket, value) frames, LOCF + linear both checked."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    rows = []
    for g in ("a", "b", "c"):
        buckets = sorted(rng.sample(range(0, 300, 10), rng.randint(2, 12)))
        for b in buckets:
            rows.append((g, b, None if rng.random() < 0.3 else round(rng.uniform(-5, 5), 3)))
    sdf = spark.createDataFrame(rows, "g string, bucket long, v double")

    got_locf = {
        (r.g, r.bucket): r.v
        for r in gapfill(sdf, 10, ["g"], {"v": "locf"}).collect()
    }
    got_lin = {
        (r.g, r.bucket): r.v
        for r in gapfill(sdf, 10, ["g"], {"v": "linear"}).collect()
    }

    pdf = pd.DataFrame(rows, columns=["g", "bucket", "v"])
    want_locf, want_lin = {}, {}
    for g, sub in pdf.groupby("g"):
        sub = sub.set_index("bucket").sort_index()
        dense = sub.reindex(range(sub.index.min(), sub.index.max() + 1, 10))
        locf = dense["v"].ffill()
        # pandas interpolate on the index == our linear fill; boundary
        # gaps clamp to the edge values (limit_direction='both')
        lin = dense["v"].interpolate(method="index", limit_direction="both")
        for b in dense.index:
            want_locf[(g, int(b))] = None if pd.isna(locf[b]) else locf[b]
            want_lin[(g, int(b))] = None if pd.isna(lin[b]) else lin[b]

    assert set(got_locf) == set(want_locf)
    for key in want_locf:
        if want_locf[key] is None:
            assert got_locf[key] is None, key
        else:
            assert got_locf[key] == pytest.approx(want_locf[key]), key
        if want_lin[key] is None:
            assert got_lin[key] is None, key
        else:
            assert got_lin[key] == pytest.approx(want_lin[key]), key


def test_gapfill_plan_shape(spark):
    """No cartesian/nested-loop join anywhere; the dense spine comes from
    an explode over the per-group range aggregate, not a rescan of the
    raw frame."""
    out = gapfill(_rolled(spark), 10, ["g"], {"n": "zero", "v": "locf"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_time_bucket_exact_at_int64_extremes(spark):
    """The ns path divides by 1e9 as DECIMAL: a double division of an
    int64 beyond 2^62 ns rounds converting to double and can truncate
    one bucket low (off-grid). Probe the extremes on both sides of the
    epoch plus Long.MAX/MIN-adjacent values against Python's exact
    integer arithmetic."""
    from wwwision_importservice_spark.operators.timeseries import time_bucket

    step = 3600
    ns = 10**9
    long_min = -(2**63)
    vals = [
        0, 1, -1, ns - 1, -ns, 2**62, 2**62 + step * ns - 1, -(2**62),
        9_223_372_036_854_775_000,  # Long.MAX - 807
        long_min + step * ns,  # domain floor: first representable bucket start
        1_700_000_000 * ns + 123, -(3_000_000_000 * ns) - 7,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "ts long")
    got = {
        r["ts"]: r["b"]
        for r in df.select("ts", time_bucket(F.col("ts"), step).alias("b")).collect()
    }
    for v in vals:
        want = (v - (v % (step * ns))) // ns  # python %,// are floor ops
        assert got[v] == want, (v, got[v], want)
