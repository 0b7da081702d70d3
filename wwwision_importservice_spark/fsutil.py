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


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    return hadoop_path.getFileSystem(jsc.hadoopConfiguration()), hadoop_path


def list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Recursively list non-hidden data files under ``path`` (skipping
    ``_SUCCESS``/dot-files) — the observable for compaction tests and
    small-file accounting. Metadata-scale: touches the namespace, never
    file contents."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    out: list[str] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next().getPath()
        name = f.getName()
        if not name.startswith(("_", ".")):
            out.append(f.toString())
    return out


def replace_dir(spark: SparkSession, src: str, dst: str) -> None:
    """Replace directory ``dst`` with ``src`` (delete + rename).

    NOT atomic on object stores (two namespace ops); callers must
    ensure no concurrent reader — e.g. compaction runs synchronously
    inside the same ``foreachBatch`` that owns the index directory, so
    micro-batch ordering provides the exclusion."""
    fs, dst_p = _fs_and_path(spark, dst)
    _, src_p = _fs_and_path(spark, src)
    if fs.exists(dst_p):
        fs.delete(dst_p, True)
    if not fs.rename(src_p, dst_p):
        raise OSError(f"rename {src} -> {dst} failed")


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem.

    Uses the JVM-side ``FileSystem.exists`` so the answer respects
    whatever filesystem the path's scheme resolves to (local, HDFS,
    s3a, ...), same as the reads it guards. IO errors raised by the
    probe itself propagate — a filesystem that can't answer "exists?"
    can't be trusted to have no state either.
    """
    fs, hadoop_path = _fs_and_path(spark, path)
    return bool(fs.exists(hadoop_path))
