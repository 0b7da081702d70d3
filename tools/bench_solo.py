"""Solo re-measure of ONE headline query in a FRESH session (the r5
noise-audit protocol, bench.py:22-36): wait for quiet load, start a new
SparkSession, warm the query once, then best-of-5 noop-write runs.

Used for the r8 adjudication of the uniform 1.25-1.56x small-query
inflation seen in BENCH_r07 vs r06 on untouched code (VERDICT r7,
Performance): if solo times match r6, the step is session-level
(JVM/codegen/GC pressure from the heavier query mix sharing the bench
session), not per-query regressions.

Run:  python tools/bench_solo.py <query_name> [sf_dir]
Prints one JSON line {"query": ..., "best": s, "median": s, "runs": [...]}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ALL_QUERIES, wait_for_quiet_load  # noqa: E402
from wwwision_importservice_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    fn = ALL_QUERIES[name]
    load, waited = wait_for_quiet_load()
    spark = get_spark(app_name=f"bench-solo-{name}")
    fn(spark, sf_dir).count()  # warm THIS query (codegen + footers)
    runs = []
    for _ in range(5):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - start, 4))
    print(json.dumps({
        "query": name,
        "best": min(runs),
        "median": round(statistics.median(runs), 4),
        "runs": runs,
        "sf_dir": sf_dir,
        "loadavg_at_start": round(load, 2),
        "load_gate_waited_sec": waited,
    }))


if __name__ == "__main__":
    main()
