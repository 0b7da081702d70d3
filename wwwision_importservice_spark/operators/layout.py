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
composite-index shape). For two independently-filtered dimensions an
interleaved (Z-order) key would balance them; that needs global rank
computation per column — not worth it until both dimensions genuinely
carry selective filters, so it is deliberately not implemented here.
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


def files_touched(df: DataFrame) -> int:
    """How many distinct files a (filtered) scan actually reads — the
    observable for layout tests and for sizing decisions. Counts
    ``input_file_name()`` over the surviving rows, so it reflects
    row-group- and file-level pruning the engine applied."""
    return df.select(F.input_file_name()).distinct().count()
