#!/usr/bin/env python3
"""Chunk-count scale rehearsal (round-6 judge item #7).

All regular bench evidence sits at ~47 chunks; 100 TB is ~10^6 chunks. The
scale risk isn't the executors (payload work is per-chunk and distributed)
— it's any DRIVER-side path that grows with #chunks. This script forces a
chunk count by lowering max_rows over the same input, runs
encode → lookup → evidence-lint → planner, and times the driver-side
planner paths:

  - plan_from_encoded: the majority-vote collects (must stay O(#columns))
  - rewrite_from_evidence's signature derivation: the distinct-signature
    collect (must stay O(#distinct signatures), not O(#chunks))
  - lookup(1 doc): candidate derivation + pruned decode
  - lint_encoded: full evidence pass wall (distributed, for context)

Prints one JSON line per chunk-count tier; paste the table into
BENCH/BASELINE.md §6. Usage: python tools/scale_rehearsal.py [tiers...]
(default tiers: 47 500 5000 — approximate targets, actual counts printed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from bench import host_gauge
    from tokenlake import decode_job, encode_job, lint_job
    from tokenlake.schema import generate_sequences
    from tokenlake.session import get_spark

    targets = [int(a) for a in sys.argv[1:]] or [47, 500, 5000]
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    print(json.dumps({"gauge": host_gauge()}))

    for target in targets:
        # size the input so max_rows ≥ 8 still yields ~target chunks
        # (generate_sequences: rows ≈ 226k × scale)
        scale = max(0.05, target * 8 * 1.2 / 226_000)
        df = spark.createDataFrame(generate_sequences(scale=scale)).cache()
        n_rows = df.count()
        max_rows = max(8, n_rows // target)
        with tempfile.TemporaryDirectory(prefix="tl_scale_") as td:
            out = os.path.join(td, "out")
            t0 = time.perf_counter()
            s = encode_job.run(spark, df, out, resume=False, max_rows=max_rows)
            t_encode = time.perf_counter() - t0
            chunks = s["chunks"]

            doc = df.select("doc_id").first()["doc_id"]
            t0 = time.perf_counter()
            n_hit = decode_job.lookup(spark, out, [doc]).count()
            t_lookup = time.perf_counter() - t0

            t0 = time.perf_counter()
            ev = lint_job.lint_encoded(spark, out)
            n_verdicts = ev.count()
            t_lint = time.perf_counter() - t0

            # rewrite_from_evidence's DRIVER-side signature derivation,
            # verbatim (encode_job.rewrite_from_evidence): distinct
            # signatures + per-column majority tallies reach the driver —
            # chunk-id sets never do
            t0 = time.perf_counter()
            from pyspark import StorageLevel

            flagged = ev.filter(
                F.col("rule").isin(
                    "enable-dictionary", "disable-dictionary",
                    "enable-compression", "disable-compression",
                )
            ).persist(StorageLevel.MEMORY_AND_DISK)  # as rewrite_from_evidence does
            chunk_sigs = flagged.groupBy("chunk_id").agg(
                F.sort_array(
                    F.collect_set(F.concat_ws("=", "column", "rule"))
                ).alias("sig")
            )
            sigs = [r["sig"] for r in chunk_sigs.select("sig").distinct().collect()]
            votes = (
                flagged.filter(
                    F.col("rule").isin("enable-compression", "disable-compression")
                )
                .groupBy("column", "rule")
                .count()
                .collect()
            )
            t_sig_collect = time.perf_counter() - t0
            flagged.unpersist()

            t0 = time.perf_counter()
            cfg = encode_job.plan_from_encoded(spark, out)
            t_plan = time.perf_counter() - t0

            print(
                json.dumps(
                    {
                        "target_chunks": target,
                        "chunks": chunks,
                        "max_rows": max_rows,
                        "encode_s": round(t_encode, 2),
                        "lookup_s": round(t_lookup, 2),
                        "lookup_rows": n_hit,
                        "lint_s": round(t_lint, 2),
                        "lint_verdicts": n_verdicts,
                        "planner_sig_collect_s": round(t_sig_collect, 2),
                        "distinct_signatures": len(sigs),
                        "vote_rows_to_driver": len(votes),
                        "plan_from_encoded_s": round(t_plan, 2),
                        "rows": n_rows,
                        "plan_overrides": len(cfg.overrides),
                    }
                )
            )
        df.unpersist()
    print(json.dumps({"gauge_end": host_gauge()}))


if __name__ == "__main__":
    main()
