"""Dump .explain("formatted") for every headline query to plans/r14/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each headline query (or the
named subset). Plan capture is driver-side only — safe to run under load;
lifecycle queries (s5, x2_incremental, x10) run their internal jobs once
during frame construction, which does not change what the final frame's
plan shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ALL_QUERIES, HEADLINE, SF_DIR  # noqa: E402
from wwwision_importservice_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        fn = ALL_QUERIES.get(name)
        if fn is None:
            print(f"# skip {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exchange = text.count("Exchange")
        joins = [
            j for j in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct",
            ) if j in text
        ]
        pyeval = [
            p for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                        "FlatMapGroupsInPandas", "MapInPandas") if p in text
        ]
        print(f"{name}: Exchange={n_exchange} joins={joins} python={pyeval}")


if __name__ == "__main__":
    main()
