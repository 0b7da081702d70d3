"""Data LAYOUT for scan pruning — clustering a table on its filter
columns so downstream reads skip files and row groups.

No reference counterpart (the reference writes row-at-a-time through
Doctrine, ``DbalTarget.php``); this is the Spark-native storage-side
half of predicate pushdown: pushdown can only *skip* data the writer
physically co-located. At 100 TB the difference between a clustered
and an unclustered corpus is the difference between a filtered read
touching 1/1000th of the files and touching all of them.

Two layouts, two use cases:

- :func:`clustered` — RANGE-cluster on the filter columns
  (``repartitionByRange`` + ``sortWithinPartitions``): every file owns
  a contiguous key range, so point/range filters prune to O(1) files
  via parquet footer min-max stats. The right layout for
  time-/id-/domain-filtered scans. One shuffle at write time, paid
  once, amortized over every subsequent read.
- ``sinks/bucketed.py`` (existing) — HASH-bucket for shuffle-free
  equi-joins against a co-bucketed table. Bucketing optimizes joins,
  range-clustering optimizes filters; they compose (cluster within
  buckets) when both matter.

Lexicographic multi-column clustering prunes perfectly on the leading
column and degrades toward no-pruning on trailing ones (the classic
composite-index shape). When SEVERAL dimensions independently carry
selective filters, use :func:`clustered_zorder` instead: each column is
bucketed by its own approximate-quantile boundaries (one
``approxQuantile`` pass, driver-held boundary arrays — no global rank
shuffle) and the bucket bits are Morton-interleaved, so a filter on ANY
clustered column prunes to ~N^((d-1)/d) of the files instead of all of
them. Linear clustering still beats Z-order when one column dominates
the filters — interleaving trades leading-column locality for balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clustered(
    df: DataFrame, cols: list[str], n_partitions: int | None = None
) -> DataFrame:
    """Range-cluster ``df`` on ``cols``: each output partition (→ file,
    when written) owns a contiguous range of the clustering key, rows
    sorted within — parquet footers then carry tight min-max stats and
    filtered scans skip whole files. ``n_partitions`` defaults to
    Spark's shuffle parallelism; size it so partitions land near the
    target file size (e.g. total_bytes / 512 MB) at scale."""
    key = [F.col(c) for c in cols]
    parted = (
        df.repartitionByRange(n_partitions, *key)
        if n_partitions
        else df.repartitionByRange(*key)
    )
    return parted.sortWithinPartitions(*key)


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` at ``path`` range-clustered on ``cols``."""
    clustered(df, cols, n_partitions).write.mode(mode).parquet(path)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, relative_error: float = 0.001
) -> tuple[DataFrame, str]:
    """Attach a Morton (Z-order) key column interleaving ``bits``
    quantile-bucket bits per clustering column. Returns ``(df_with_key,
    key_col_name)``.

    Bucket boundaries come from ONE ``approxQuantile`` pass (all columns
    in a single job; GK sketch, no shuffle) and live in broadcast-sized
    literal arrays — quantile buckets, not equal-width, so skewed
    columns still fill all 2^bits buckets. Per row the bucket is
    ``count(boundaries <= value)`` via ``F.aggregate`` over the literal
    array (O(2^bits) codegen'd comparisons), then bits interleave with
    shift/or — all JVM-side expressions, no UDF.
    """
    if not 1 <= bits <= 16:
        raise ValueError("zorder_key requires 1 <= bits <= 16")
    # Validate up front: a non-numeric clustering column (string/date)
    # or an all-NULL one would silently map every row to bucket 0 —
    # the Z-order degenerates to no pruning on that dimension with no
    # error anywhere downstream. Fail loudly instead; callers cluster
    # on dates by casting to epoch days/seconds explicitly.
    from pyspark.sql.types import NumericType

    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"zorder_key: unknown column {c!r}")
        if not isinstance(schema[c], NumericType):
            raise TypeError(
                f"zorder_key: column {c!r} has non-numeric type "
                f"{schema[c].simpleString()} — cast it (e.g. a date to "
                "epoch days) before clustering, or it would silently "
                "contribute a constant 0 to every Morton key"
            )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = df.stat.approxQuantile(cols, probs, relative_error)
    for c, bounds in zip(cols, all_bounds):
        if not bounds:
            raise ValueError(
                f"zorder_key: column {c!r} has no non-null values — "
                "its quantile boundaries are empty and every row would "
                "land in bucket 0 (no pruning on that dimension)"
            )

    def bucket(col: str, bounds: list[float]):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(col).cast("double") >= b, 1).otherwise(0),
        )

    key = F.lit(0).cast("long")
    d = len(cols)
    for ci, (col, bounds) in enumerate(zip(cols, all_bounds)):
        bk = bucket(col, bounds).cast("long")
        for bi in range(bits):
            # bit bi of this column lands at interleaved position
            # bi*d + ci (LSB-first round-robin across columns)
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bk, bi).bitwiseAND(F.lit(1)), bi * d + ci
                )
            )
    name = "__zorder"
    return df.withColumn(name, key), name


def clustered_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int | None = None,
    bits: int = 8,
) -> DataFrame:
    """Multi-dimensionally cluster ``df`` on ``cols`` via the Morton
    key: range-partition + sort on the interleaved key, then drop it.
    Written out, a selective filter on ANY of the clustered columns
    prunes files (each file owns a compact Z-range = a small hyper-
    rectangle of the bucket grid), where :func:`clustered` only prunes
    on its leading column. Costs one approxQuantile job + one shuffle."""
    keyed, key = zorder_key(df, cols, bits=bits)
    parted = (
        keyed.repartitionByRange(n_partitions, F.col(key))
        if n_partitions
        else keyed.repartitionByRange(F.col(key))
    )
    return parted.sortWithinPartitions(key).drop(key)


def files_touched(df: DataFrame) -> int:
    """How many distinct files a (filtered) scan actually reads — the
    observable for layout tests and for sizing decisions. Counts
    ``input_file_name()`` over the surviving rows, so it reflects
    row-group- and file-level pruning the engine applied."""
    return df.select(F.input_file_name()).distinct().count()


def clustering_staleness(
    df: DataFrame,
    cols: list[str],
    *,
    probes_per_col: int = 32,
    relative_error: float = 0.001,
) -> dict:
    """Measure how much a table's clustering has DEGRADED — the metric
    that decides when :func:`recluster` is worth its shuffle.

    Appends silently break clustering: every appended file spans the
    whole key range, so a point filter that touched 1 of N files on the
    fresh layout touches 1 + (appended files) afterwards — pruning decays
    with no error anywhere. This quantifies the decay:

    - per clustered column, compute each file's ``[min, max]`` interval
      (one column-pruned scan, aggregated per ``input_file_name()`` —
      a metadata-sized result; on engines exposing parquet footers this
      is a pure metadata read, here it is one cheap scan of only the
      clustering columns);
    - probe it with ``probes_per_col`` evenly-spaced quantiles of the
      column (one GK ``approxQuantile`` pass — deterministic, no
      sampling RNG) and average how many file intervals contain each
      probe — the EXPECTED files a point filter must touch.

    Returns ``{"n_files", "per_column": {col: avg_files_per_point},
    "avg_files_per_point"}`` (the per-column max — pruning is only as
    good as the worst filtered dimension).

    Trigger (documented contract, pinned by the recluster test): a
    fresh range-clustered layout measures ~1–2 files per point (range
    boundaries put a key in at most 2 files); a fresh Z-order layout
    ~2·N^((d-1)/d)/... its own pinned floor. Recluster when
    ``avg_files_per_point`` exceeds ~4× the freshly-clustered floor for
    your layout, or on a schedule once appended bytes exceed ~25% of
    the table — below that the decayed reads are cheaper than the
    rewrite shuffle, above it every downstream scan pays more than the
    one-off rewrite."""
    stats = (
        df.select(F.input_file_name().alias("__f"), *cols)
        .groupBy("__f")
        .agg(
            *[F.min(c).alias(f"{c}__min") for c in cols],
            *[F.max(c).alias(f"{c}__max") for c in cols],
        )
        .collect()  # one row per FILE — metadata scale, never row scale
    )
    n_files = len(stats)
    probs = [(i + 0.5) / probes_per_col for i in range(probes_per_col)]
    all_probes = df.stat.approxQuantile(cols, probs, relative_error)
    per_col: dict[str, float] = {}
    for c, probes in zip(cols, all_probes):
        if not probes:
            raise ValueError(f"clustering_staleness: column {c!r} is all-NULL")
        touched = [
            sum(
                1
                for r in stats
                if r[f"{c}__min"] is not None and r[f"{c}__min"] <= p <= r[f"{c}__max"]
            )
            for p in probes
        ]
        per_col[c] = round(sum(touched) / len(touched), 3)
    return {
        "n_files": n_files,
        "per_column": per_col,
        "avg_files_per_point": max(per_col.values()) if per_col else 0.0,
    }


def recluster(
    spark,
    path: str,
    cols: list[str],
    *,
    zorder: bool = False,
    n_partitions: int | None = None,
    bits: int = 8,
) -> dict:
    """Rewrite the parquet table at ``path`` freshly clustered on
    ``cols`` — the recovery step for append-degraded layouts (see
    :func:`clustering_staleness` for when). One full read + one
    clustering shuffle + one write, landed in a sibling temp dir and
    swapped in with the crash-safe backup-rename (``fsutil.replace_dir``
    — an interrupted swap is restorable via ``fsutil.recover_dir``, the
    table is never observable as missing). Callers must exclude
    concurrent writers for the swap, same as LSH index compaction.

    Returns staleness measured before and after (``{"before", "after"}``)
    so the caller — and the pinning test — can see the recovery."""
    from wwwision_importservice_spark.fsutil import recover_dir, replace_dir

    # a previous recluster/compact may have crashed mid-swap — restore
    # the backup before reading so the table never reads as missing
    recover_dir(spark, path)
    df = spark.read.parquet(path)
    before = clustering_staleness(df, cols)
    out = (
        clustered_zorder(df, cols, n_partitions, bits=bits)
        if zorder
        else clustered(df, cols, n_partitions)
    )
    tmp = path.rstrip("/") + "__reclustering"
    out.write.mode("overwrite").parquet(tmp)
    replace_dir(spark, tmp, path)
    after = clustering_staleness(spark.read.parquet(path), cols)
    return {"before": before, "after": after}
