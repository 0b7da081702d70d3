"""Tiny Hadoop-filesystem helpers shared by operators and streaming.

The recurring need: "read this parquet state directory, or start fresh
iff it has never been written". A bare ``try/except Exception`` around
``spark.read.parquet`` conflates PATH-NOT-FOUND with transient IO or
permission failures — and for stateful operators (a near-dup index, a
drift-baseline history) that conflation silently resets state and
corrupts downstream invariants. The explicit existence probe keeps
"missing" and "broken" distinguishable: only the former maps to
"first run"; the latter propagates so the caller (a micro-batch, a
pipeline run) retries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem.

    Uses the JVM-side ``FileSystem.exists`` so the answer respects
    whatever filesystem the path's scheme resolves to (local, HDFS,
    s3a, ...), same as the reads it guards. IO errors raised by the
    probe itself propagate — a filesystem that can't answer "exists?"
    can't be trusted to have no state either.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hadoop_path))
