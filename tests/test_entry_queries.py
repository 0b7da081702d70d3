"""Registry-level tests that don't fit the oracle-parity harness:
sketch-accuracy tolerances (engine-specific estimates can't hash-match
another engine) and registry invariants."""

from __future__ import annotations

from wwwision_importservice_spark.entry_queries import (
    a3_approx_aggregates,
    a3_quantiles,
)


def test_a3_sketch_accuracy(spark, sf_dir):
    """The sketch twins (approx_count_distinct HLL++, percentile_approx)
    must track the exact aggregates: HLL++ within its published ~2.3%
    relative error at rsd=0.05 defaults (allow 5%), the 10k-bucket
    quantile sketch within 1% relative on every probed percentile."""
    from pyspark.sql import functions as F

    from wwwision_importservice_spark.entry_queries import load

    exact = {
        r["l_returnflag"]: r.asDict()
        for r in a3_quantiles(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    true_distinct = {
        r["l_returnflag"]: r["nd"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    approx = a3_approx_aggregates(spark, sf_dir).collect()
    assert len(approx) == len(exact)
    for row in approx:
        flag = row["l_returnflag"]
        assert row["n_rows"] == exact[flag]["n_rows"]
        nd = true_distinct[flag]
        assert abs(row["approx_parts"] - nd) <= max(0.05 * nd, 2), (
            flag, row["approx_parts"], nd,
        )
        for p in ("p50", "p95", "p99"):
            assert abs(row[p] - exact[flag][p]) <= 0.01 * abs(exact[flag][p]), (
                flag, p, row[p], exact[flag][p],
            )


def test_operators_md_in_sync():
    """OPERATORS.md is generated from the registry — regenerate with
    tools/dump_operators.py whenever a query is added or removed."""
    import os

    from wwwision_importservice_spark.entry_queries import (
        PYTEST_QUERIES,
        QUERIES,
    )

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "OPERATORS.md")
    text = open(path).read()
    assert (
        f"Totals: {len(QUERIES)} driver + {len(PYTEST_QUERIES)} pytest-only"
        in text
    ), "totals drifted — rerun tools/dump_operators.py"
    for name in list(QUERIES) + list(PYTEST_QUERIES):
        assert f"`{name}`" in text, f"{name} missing — rerun tools/dump_operators.py"
