"""RecordFrame tests mirroring the reference's DataRecordsTest plus the
keying/version edge cases (SURVEY §5, FIXTURES §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wwwision_importservice_spark.errors import ConfigurationError
from wwwision_importservice_spark.record import RecordFrame, dedup_last_wins


def raw(spark, rows, schema="id string, v string, title string, _ord long"):
    return spark.createDataFrame(rows, schema)


def test_keying_and_count(spark):
    # DataRecordsTest.php:24-43 — fromRawArray count
    df = raw(spark, [("first", None, "a", 1), ("second", None, "b", 2)])
    rf = RecordFrame.from_raw(df, "id", order_by="_ord")
    assert rf.count() == 2
    assert set(r["_id"] for r in rf.get_ids().collect()) == {"first", "second"}


def test_last_write_wins_dedup(spark):
    # DataRecords.php:39-41 — assoc-overwrite keying → last wins by _ord
    df = raw(
        spark,
        [("k", None, "old", 1), ("k", None, "new", 9), ("other", None, "x", 2)],
    )
    rf = RecordFrame.from_raw(df, "id", order_by="_ord")
    rows = {r["_id"]: r["title"] for r in rf.df.collect()}
    assert rows == {"k": "new", "other": "x"}


def test_missing_id_column_raises(spark):
    df = raw(spark, [("a", None, "t", 1)])
    with pytest.raises(ConfigurationError):
        RecordFrame.from_raw(df, "nope")


def test_null_id_raises_strict(spark):
    df = raw(spark, [(None, None, "t", 1)])
    rf = RecordFrame.from_raw(df, "id", order_by="_ord")
    with pytest.raises(Exception, match="Missing id attribute"):
        rf.count()


def test_null_id_dropped_lenient(spark):
    df = raw(spark, [(None, None, "t", 1), ("a", None, "u", 2)])
    rf = RecordFrame.from_raw(df, "id", order_by="_ord", strict=False)
    assert rf.count() == 1


def test_version_parse_ladder(spark):
    # FIXTURES §4: int, numeric string, ISO date string → comparable long
    df = raw(
        spark,
        [
            ("a", "1560523547", "t", 1),
            ("b", "2019-06-14T12:05:47Z", "t", 2),
            ("c", None, "t", 3),
        ],
    )
    rf = RecordFrame.from_raw(df, "id", version_attribute="v", order_by="_ord")
    got = {r["_id"]: r["_version"] for r in rf.df.collect()}
    assert got["a"] == 1560523547
    assert got["b"] == 1560513947  # 2019-06-14T12:05:47Z
    assert got["c"] is None  # unversioned


def test_negative_version_raises(spark):
    # Lazy semantics: the error surfaces when _version is materialized
    # (count() would prune the column away — that's Catalyst working).
    df = raw(spark, [("a", "-5", "t", 1)])
    rf = RecordFrame.from_raw(df, "id", version_attribute="v", order_by="_ord")
    with pytest.raises(Exception, match="negative version"):
        rf.df.collect()


def test_map_rewrites_ids(spark):
    # DataRecordsTest.php:48-57 — map that appends '-changed' to ids
    df = raw(spark, [("first", None, "a", 1), ("second", None, "b", 2)])
    rf = RecordFrame.from_raw(df, "id", order_by="_ord")
    mapped = rf.map(lambda d: d.withColumn("_id", F.concat("_id", F.lit("-changed"))))
    ids = {r["_id"] for r in mapped.get_ids().collect()}
    assert ids == {"first-changed", "second-changed"}


def test_with_records_first_wins(spark):
    # DataRecords.php:59-67 — withRecord adds iff id absent
    base = RecordFrame.from_raw(raw(spark, [("a", None, "base", 1)]), "id", order_by="_ord")
    other = RecordFrame.from_raw(
        raw(spark, [("a", None, "clobber", 1), ("b", None, "new", 2)]), "id", order_by="_ord"
    )
    merged = base.with_records(other)
    rows = {r["_id"]: r["title"] for r in merged.df.collect()}
    assert rows == {"a": "base", "b": "new"}


def test_filter(spark):
    df = raw(spark, [("a", None, "keep", 1), ("b", None, "drop", 2)])
    rf = RecordFrame.from_raw(df, "id", order_by="_ord")
    assert rf.filter(F.col("title") == "keep").count() == 1


def test_dedup_last_wins_at_scale_shape(spark, sf_dir):
    # composite-key dedup over lineitem (FIXTURES §2)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.withColumn("id", F.concat_ws("|", "l_orderkey", "l_linenumber"))
    out = dedup_last_wins(df, "id", F.col("l_partkey"))
    assert out.count() == df.select("id").distinct().count()
