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


def test_registry_rotations_name_live_successors():
    """Every row demoted from the driver tier carries a 'slot ceded
    to <name>' note, and every such note must name a query that still
    EXISTS — a renamed or deleted successor would silently break the
    audit trail the rotation convention exists for (VERDICT r10 ask
    #8). Checked both ways: 'ceded to X' (the demoted row names who
    took its slot) and 'ceded by X' (the promoted row names who paid
    for it)."""
    import inspect
    import re

    from wwwision_importservice_spark import entry_queries as eq

    src = inspect.getsource(eq)
    all_names = set(eq.QUERIES) | set(eq.PYTEST_QUERIES)
    refs = re.findall(r"ceded (?:to|by)\s+(?:the\s+)?(\w+)", src)
    named = [r for r in refs if not r.startswith("fake")]  # prose like
    # 'ceded by the fake-window ...' describes a deleted twin, allowed
    assert named, "rotation notes vanished — the convention is load-bearing"
    missing = sorted({r for r in named if r not in all_names})
    assert not missing, f"rotation notes reference unknown queries: {missing}"
    # every 'ceded to X' successor must still exist; additionally the
    # rows driver=False-registered with a ceded note must themselves be
    # in the pytest tier (a demoted row that fell out of BOTH registries
    # would lose its oracle entirely)
    for m in re.finditer(
        r'_register\(\s*\n?\s*"(\w+)",[^)]*?driver=False[^)]*?ceded to\s+(\w+)',
        src,
        re.DOTALL,
    ):
        demoted, successor = m.group(1), m.group(2)
        assert demoted in eq.PYTEST_QUERIES, (
            f"{demoted} demoted but not in the pytest tier"
        )
        assert successor in all_names, (
            f"{demoted} names unknown successor {successor}"
        )
