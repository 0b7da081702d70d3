"""Declarative data-quality checks, computed in ONE aggregation pass.

The Deequ-shaped guard a sync pipeline runs between extract and apply
(the reference validates option *schemas* — ``OptionsSchema.php`` — but
has nothing for the *data*; this is the data-level analogue): declare
constraints, get back one row per constraint with the measured metric
and a pass/fail verdict, and gate the run on failures.

Scale shape: every metric is an aggregate expression, and the whole
suite evaluates in a SINGLE ``agg()`` over one scan — a 40-constraint
suite over 100 TB costs exactly one pass (plus the shuffle-free
partial/final global aggregate), not 40 jobs. Exact ``unique`` checks
use ``count_distinct`` (one expand inside the same aggregate);
everything else is a conditional count. The per-constraint fan-out to
rows happens on the aggregate's single output row.

Verdicts are computed engine-side so a pipeline can gate on
``passed = false`` rows with one filter; :func:`assert_checks` wraps
that for imperative callers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``metric`` (a ZERO-ARG CALLABLE returning an
    aggregate Column producing a DOUBLE — lazy, so suites can be
    declared before any SparkSession exists, e.g. at preset-build time
    in the CLI), its human name, the column it watches, and the
    inclusive [lo, hi] band the metric must land in."""

    name: str
    column: str
    metric: Callable[[], Column]
    lo: float
    hi: float


def not_null(column: str, min_fraction: float = 1.0) -> Check:
    """Fraction of rows with ``column`` non-null ≥ ``min_fraction``."""
    def frac() -> Column:
        return F.avg(F.col(column).isNotNull().cast("double"))

    return Check(f"not_null({column})", column, frac, min_fraction, 1.0)


def unique(column: str) -> Check:
    """``column`` carries no duplicate values (exact; one
    count_distinct inside the shared aggregate). NULLs don't count as
    duplicates of each other — the metric is distinct/non-null."""
    def ratio() -> Column:
        return F.count_distinct(F.col(column)).cast("double") / F.greatest(
            F.count(F.col(column)).cast("double"), F.lit(1.0)
        )

    return Check(f"unique({column})", column, ratio, 1.0, 1.0)


def in_range(column: str, lo: float, hi: float) -> Check:
    """Every non-null value of ``column`` lies in [lo, hi]: the metric
    is the conforming fraction, required to be 1."""
    def frac() -> Column:
        ok = F.col(column).isNull() | F.col(column).between(F.lit(lo), F.lit(hi))
        return F.avg(ok.cast("double"))

    return Check(f"in_range({column})", column, frac, 1.0, 1.0)


def accepted_values(column: str, values: list) -> Check:
    """Every non-null value of ``column`` is one of ``values``."""
    def frac() -> Column:
        ok = F.col(column).isNull() | F.col(column).isin(values)
        return F.avg(ok.cast("double"))

    return Check(f"accepted_values({column})", column, frac, 1.0, 1.0)


def matches(column: str, pattern: str, min_fraction: float = 1.0) -> Check:
    """Fraction of non-null values matching the (RE2-compatible, so the
    DuckDB oracle can mirror it) regex ≥ ``min_fraction``; a fully-null
    column vacuously passes."""
    def frac() -> Column:
        non_null = F.count(F.col(column)).cast("double")
        hits = F.sum(
            F.when(F.col(column).rlike(pattern), 1).otherwise(0)
        ).cast("double")
        return F.when(non_null > 0, hits / non_null).otherwise(F.lit(1.0))

    return Check(f"matches({column})", column, frac, min_fraction, 1.0)


def row_count(lo: int, hi: int | None = None) -> Check:
    """Total row count in [lo, hi] (hi=None → unbounded above)."""
    return Check(
        "row_count", "*", lambda: F.count(F.lit(1)).cast("double"),
        float(lo), float(hi) if hi is not None else float("inf"),
    )


def from_config(cfgs: list[dict]) -> list[Check]:
    """Build a suite from preset-YAML config dicts — the declarative
    form behind the ``qualityChecks`` preset option::

        qualityChecks:
          - {type: unique, column: id}
          - {type: notNull, column: email, minFraction: 0.9}
          - {type: inRange, column: price, lo: 0, hi: 1000000}
          - {type: acceptedValues, column: status, values: [O, F, P]}
          - {type: matches, column: sku, pattern: '^[A-Z]{3}-'}
          - {type: rowCount, lo: 1}
    """
    out: list[Check] = []
    for cfg in cfgs:
        kind = cfg.get("type")
        if kind == "unique":
            out.append(unique(cfg["column"]))
        elif kind == "notNull":
            out.append(not_null(cfg["column"], float(cfg.get("minFraction", 1.0))))
        elif kind == "inRange":
            out.append(in_range(cfg["column"], float(cfg["lo"]), float(cfg["hi"])))
        elif kind == "acceptedValues":
            out.append(accepted_values(cfg["column"], list(cfg["values"])))
        elif kind == "matches":
            out.append(
                matches(
                    cfg["column"], cfg["pattern"], float(cfg.get("minFraction", 1.0))
                )
            )
        elif kind == "rowCount":
            hi = cfg.get("hi")
            out.append(row_count(int(cfg["lo"]), int(hi) if hi is not None else None))
        else:
            raise ValueError(f"Unknown quality check type: {kind!r}")
    return out


def validate_checks(checks: list[Check]) -> None:
    """Config-validate a check list (non-empty, unique names); raises
    plain ``ValueError``. Exposed so long-lived callers (streaming
    sync) can fail fast at wiring time instead of per micro-batch."""
    if not checks:
        raise ValueError("check_suite requires at least one check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregation pass. Returns one row
    per check: ``(check, column, metric, lo, hi, passed)``, in the
    declared order (``check`` names must be unique)."""
    validate_checks(checks)
    agged = df.agg(
        *[c.metric().cast("double").alias(f"__m{i}") for i, c in enumerate(checks)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.round(F.col(f"__m{i}"), 9).alias("metric"),
                F.lit(c.lo).alias("lo"),
                F.lit(c.hi).alias("hi"),
                (
                    (F.col(f"__m{i}") >= c.lo - 1e-9)
                    & (F.col(f"__m{i}") <= c.hi + 1e-9)
                ).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agged.select(F.explode(rows).alias("r")).select("r.*")


def check_drift(
    df: DataFrame,
    checks: list[Check],
    history_dir: str,
    run_id: str,
    max_relative_change: float = 0.5,
) -> DataFrame:
    """Run-over-run metric DRIFT detection — the anomaly companion to
    the absolute bands: evaluate the suite, compare each metric to the
    same check's value from the most recent prior run in
    ``history_dir``, flag relative changes beyond
    ``max_relative_change``, and append this run's report for the next
    one. First run (empty history) flags nothing.

    Catches the failures static bounds can't: a feed that silently
    halves its row count, a null-rate that creeps from 1% to 30% —
    still inside the declared band, wildly out of character.

    Returns one row per check: ``(check, column, metric, prev_metric,
    rel_change, drifted)``. The report frames are tiny (one row per
    check), so the history read/write is metadata-scale regardless of
    data size; the data itself is still touched exactly once. History
    is written with per-``run_id`` dynamic partition OVERWRITE — a
    re-run replaces its own report instead of append-duplicating it
    (the changelog lesson, ``plans/pipeline.py``), still comparing
    against its true predecessor.
    """
    spark = df.sparkSession
    report = check_suite(df, checks)
    # Explicit existence probe, not try/except around the read: a
    # transient read failure must propagate, not silently reset the
    # drift baseline (which would mask the very anomaly being hunted).
    from wwwision_importservice_spark.fsutil import path_exists

    history = (
        spark.read.parquet(history_dir)
        if path_exists(spark, history_dir)
        else None
    )
    prev = None
    seq_val = 0
    if history is not None:
        others = history.filter(F.col("run_id") != run_id)
        prev_row = (
            others.orderBy(F.col("seq").desc()).select("run_id", "seq").first()
        )
        if prev_row:
            prev = others.filter(F.col("run_id") == prev_row["run_id"]).select(
                F.col("check").alias("__pc"),
                F.col("metric").alias("prev_metric"),
            )
        # a re-run keeps its original position in the sequence
        own = history.filter(F.col("run_id") == run_id).agg(F.max("seq")).first()[0]
        seq_val = (
            own if own is not None
            else (prev_row["seq"] + 1 if prev_row else 0)
        )
    if prev is None:
        out = report.select(
            "check", "column", "metric",
            F.lit(None).cast("double").alias("prev_metric"),
            F.lit(None).cast("double").alias("rel_change"),
            F.lit(False).alias("drifted"),
        )
    else:
        rel = F.when(
            F.col("prev_metric") == 0.0,
            F.when(F.col("metric") == 0.0, 0.0).otherwise(float("inf")),
        ).otherwise(F.abs(F.col("metric") - F.col("prev_metric")) / F.abs("prev_metric"))
        out = (
            report.join(prev, report["check"] == prev["__pc"], "left")
            .select(
                "check", "column", "metric", "prev_metric",
                F.round(rel, 9).alias("rel_change"),
                F.coalesce(
                    rel > F.lit(max_relative_change), F.lit(False)
                ).alias("drifted"),
            )
        )
    (
        report.withColumn("run_id", F.lit(run_id))
        .withColumn("seq", F.lit(int(seq_val)))
        .write.partitionBy("run_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(history_dir)
    )
    return out


def assert_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run :func:`check_suite` and raise :class:`QualityCheckFailure`
    listing every failed constraint; returns the report frame when all
    pass. The imperative gate for pipeline preflights — the collect
    touches only the per-check report rows, never the data.

    A misconfigured suite (empty, duplicate names) still raises plain
    ``ValueError`` from :func:`check_suite` — callers that skip-on-
    violation catch only ``QualityCheckFailure`` so config errors
    propagate instead of skipping data forever.
    """
    from wwwision_importservice_spark.errors import QualityCheckFailure

    report = check_suite(df, checks)
    failed = [
        f"{r['check']}: metric={r['metric']} outside [{r['lo']}, {r['hi']}]"
        for r in report.collect()
        if not r["passed"]
    ]
    if failed:
        raise QualityCheckFailure(
            "data-quality checks failed: " + "; ".join(failed)
        )
    return report
