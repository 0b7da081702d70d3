"""operators/bucketing.py — bucketed writes and shuffle-free co-located
joins (the x10_bucketed_join driver query's building blocks)."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F
import pytest

from wwwision_importservice_spark.operators.bucketing import (
    bucket_spec,
    bucketed_join,
    write_bucketed,
)

from test_plans import count_exchanges, plan_of, tree_of


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed(orders, "tb_orders", str(tmp_path / "o"), "o_custkey", 8)
    write_bucketed(cust, "tb_cust", str(tmp_path / "c"), "c_custkey", 8)
    yield orders, cust
    for t in ("tb_orders", "tb_cust", "tb_cust4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    assert bucket_spec(spark, "tb_orders") == (["o_custkey"], 8)
    assert bucket_spec(spark, "tb_cust") == (["c_custkey"], 8)


def test_bucket_spec_none_for_unbucketed(spark, sf_dir, tmp_path, bucketed_pair):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    spark.sql("DROP TABLE IF EXISTS tb_plain")
    df.write.option("path", str(tmp_path / "p")).saveAsTable("tb_plain")
    try:
        assert bucket_spec(spark, "tb_plain") is None
        with pytest.raises(ValueError, match="must be bucketed"):
            bucketed_join(spark, "tb_plain", "tb_orders", "r_regionkey", "o_custkey")
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_plain")


def test_one_file_per_bucket(bucketed_pair, tmp_path):
    """The repartition-before-write contract: exactly n_buckets data
    files, so reads get per-bucket sort and minimal file overhead."""
    assert len(glob.glob(str(tmp_path / "o" / "*.parquet"))) == 8
    assert len(glob.glob(str(tmp_path / "c" / "*.parquet"))) == 8


def test_bucket_count_mismatch_raises(spark, sf_dir, tmp_path, bucketed_pair):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    write_bucketed(cust, "tb_cust4", str(tmp_path / "c4"), "c_custkey", 4)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_join(spark, "tb_cust4", "tb_orders", "c_custkey", "o_custkey")


def test_join_key_must_match_bucket_column(spark, bucketed_pair):
    with pytest.raises(ValueError, match="must match bucket columns"):
        bucketed_join(spark, "tb_cust", "tb_orders", "c_mktsegment", "o_custkey")


def test_bucketed_join_zero_exchange_and_exact(spark, bucketed_pair):
    """The whole point: join + same-key aggregation with NO Exchange in
    the physical plan, and results identical to the plain shuffle join."""
    orders, cust = bucketed_pair
    joined = bucketed_join(spark, "tb_cust", "tb_orders", "c_custkey", "o_custkey")
    agg = joined.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    tree = tree_of(plan_of(spark, agg))
    assert count_exchanges(tree) == 0, tree
    assert "SortMergeJoin" in tree, tree

    plain = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_join_conformed_key_name(spark, sf_dir, tmp_path):
    """Both tables bucketed on the SAME column name (the conformed-key
    case): the join must dedup the key column so the natural
    groupBy(key) next step doesn't hit AMBIGUOUS_REFERENCE."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.select(F.col("o_custkey").alias("custkey"), "o_totalprice")
    b = orders.select(F.col("o_custkey").alias("custkey"), "o_orderkey")
    write_bucketed(a, "tb_same_a", str(tmp_path / "a"), "custkey", 4)
    write_bucketed(b, "tb_same_b", str(tmp_path / "b"), "custkey", 4)
    try:
        j = bucketed_join(spark, "tb_same_a", "tb_same_b", "custkey", "custkey")
        assert j.columns.count("custkey") == 1
        agg = j.groupBy("custkey").count()
        tree = tree_of(plan_of(spark, agg))
        assert count_exchanges(tree) == 0, tree
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_same_a")
        spark.sql("DROP TABLE IF EXISTS tb_same_b")
