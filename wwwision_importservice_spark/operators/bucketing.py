"""Bucketed tables and shuffle-free co-located joins.

The one physical-layout lever the repo's layout module (range +
Z-order clustering, ``operators/layout.py``) does not cover: Spark's
native bucketing. A table written with ``bucketBy(n, key)`` records the
bucket spec in the catalog; any join or aggregation keyed on the bucket
column then satisfies the required ``HashPartitioning`` straight off the
scan, so the plan contains **no Exchange at all** — the 100 TB fact⋈fact
join pattern where neither side fits a broadcast and a shuffle of either
would dominate the job. (The reference's SQLite/Doctrine targets are
single-node and never face this; bucketing is the Spark-native answer to
the same "keep lookups cheap" intent behind its PRIMARY KEY on ``id``,
``/root/reference/Classes/DataTarget/DbalTarget.php:289-302``.)

Mechanics that matter at scale, encoded here rather than left to the
caller:

- **One file per bucket.** Spark writes one file per task *per bucket*;
  an unpartitioned write from T tasks yields T×n files and, worse, the
  read side then distrusts per-bucket sort order (it only elides the
  Sort when every bucket is a single file). We ``repartition(n, key)``
  first — ``repartition`` and bucketing share the same
  ``pmod(murmur3, n)`` mapping, so each task holds exactly one bucket.
- **Matching bucket counts.** Both sides of a co-located join must use
  the same ``n_buckets``; ``bucketed_join`` asserts this from the
  catalog rather than trusting the caller.
- **SMJ pinned.** AQE or the broadcast threshold could swap in a
  broadcast join (legal, but then the test proves nothing about
  bucketing), so the join applies a ``merge`` hint; with both sides
  pre-partitioned the SortMergeJoin needs no Exchange. A
  partition-LOCAL Sort node remains above each scan (visible in
  PLANS.md): since Spark 3.0 the reader only trusts per-bucket sort
  order behind ``spark.sql.legacy.bucketedTableScan.outputOrdering``,
  which forces the one-file-per-bucket read path globally — the local
  sort of already-clustered rows is the cheaper default. ``sortBy``
  still pays for itself via parquet row-group stats and faster local
  sorts; the Exchange (the network cost) is what bucketing eliminates.

Bucket count sizing: at 100 TB with ~128 MB target splits, n_buckets ≈
data_size / (buckets_per_core × 128 MB); buckets are the unit of read
parallelism for bucketed scans, so too few caps the cluster. The tests
pin the zero-Exchange plan shape at small n; the arithmetic scales n
without changing the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucket_spec", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    Repartitions to exactly one file per bucket (see module docstring)
    so reads avoid the many-files-per-bucket overhead and the per-bucket
    ``sortBy`` yields clustered row groups. ``mode("overwrite")`` +
    ``DROP TABLE`` first makes the call idempotent across repeated
    driver/bench/pytest runs.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """Read (bucket columns, bucket count) back from the catalog, or
    ``None`` if the table is not bucketed. Metadata-only (DESCRIBE)."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()  # metadata rows only
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    n = int(info["Num Buckets"])
    cols = [c.strip(" `") for c in info["Bucket Columns"].strip("[]").split(",")]
    return cols, n


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys, shuffle-free.

    Validates from the catalog that both sides are bucketed on the join
    keys with equal bucket counts (a mismatch would silently reintroduce
    an Exchange — the failure mode this module exists to prevent), then
    returns a merge-hinted join whose physical plan contains no Exchange
    (pinned in ``tests/test_plans.py``).
    """
    lspec = bucket_spec(spark, left_table)
    rspec = bucket_spec(spark, right_table)
    if lspec is None or rspec is None:
        raise ValueError(
            f"both tables must be bucketed: {left_table}={lspec} {right_table}={rspec}"
        )
    (lcols, ln), (rcols, rn) = lspec, rspec
    if ln != rn:
        raise ValueError(
            f"bucket counts differ ({left_table}:{ln} vs {right_table}:{rn}); "
            "co-located join requires equal counts — rewrite one side"
        )
    if lcols != [left_on] or rcols != [right_on]:
        raise ValueError(
            f"join keys must match bucket columns: {lcols}!={[left_on]} "
            f"or {rcols}!={[right_on]}"
        )
    left = spark.table(left_table)
    right = spark.table(right_table)
    if left_on == right_on:
        # conformed key names (both tables bucketed on e.g. user_id):
        # USING-style join dedups the key column — the expression form
        # would emit two same-named columns and break the natural
        # joined.groupBy(key) next step with AMBIGUOUS_REFERENCE
        return left.hint("merge").join(right, on=[left_on], how=how)
    return left.hint("merge").join(
        right, on=left[left_on] == right[right_on], how=how
    )
