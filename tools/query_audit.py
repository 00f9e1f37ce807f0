#!/usr/bin/env python3
"""Per-query wall + plan-shape audit over every declared driver query.

For each entry in tokenlake.queries.QUERIES: build the frame, count plan
nodes of interest (Exchange / BroadcastExchange / BatchEvalPython /
ArrowEvalPython / MapInArrow / FlatMapGroupsInArrow / CartesianProduct /
SortMergeJoin), then evaluate it with the noop sink (guide §1.4) and record
the wall. Prints one JSON line per query plus a sorted summary.

Usage: python tools/query_audit.py [sf_dir] [name...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = (
    "Exchange",
    "BroadcastExchange",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInArrow",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tokenlake.queries import QUERIES
    from tokenlake.session import get_spark

    spark = get_spark(app_name="query-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"audit:{name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            counts = {n: len(re.findall(rf"\b{n}\b", plan)) for n in NODES}
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_run = time.perf_counter() - t0
            row = {
                "query": name,
                "build_s": round(t_build, 2),
                "run_s": round(t_run, 2),
                **{k: v for k, v in counts.items() if v},
            }
        except Exception as e:  # keep auditing the rest
            row = {"query": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)
    results = [r for r in results if "run_s" in r]
    results.sort(key=lambda r: -(r["build_s"] + r["run_s"]))
    print(
        json.dumps(
            {
                "slowest": [
                    (r["query"], round(r["build_s"] + r["run_s"], 2))
                    for r in results[:12]
                ],
                "total_s": round(sum(r["build_s"] + r["run_s"] for r in results), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
