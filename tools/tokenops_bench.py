#!/usr/bin/env python3
"""Weak-scaling probe for the token-level pipeline operators (tokenops).

The north-rule scaling criterion is evidenced on the encode job (§4 of
BENCH/BASELINE.md); this probe applies the same confound-free method —
WEAK scaling at FIXED parallelism (`mult`× the input on the same cores;
ideal wall = mult × small wall; efficiency = mult × t_small / t_big) —
to the shuffle-heaviest pipeline operators:

  - span_dedup (n=16, stride=8): explode → md5 span keys → two hash
    exchanges (dropDuplicates + hot-span semi-join) — the worst shuffle
    shape in the tokenops family
  - contamination: the broadcast LEFT SEMI probe (eval = a deterministic
    ~1% doc subset), shuffle only on doc_id aggregation

Raw thread-scaling (local[8] vs local[32]) on this host is documented
noise (BENCH/BASELINE.md §4: multi-× external interference, zero-work-UDF
control inflates ×2.6); weak scaling at fixed parallelism is the
criterion this sandbox can actually evidence. Best-of-N walls; one JSON
line. Usage: python tools/tokenops_bench.py [small_scale] [mult] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from bench import host_gauge
    from tokenlake import tokenops
    from tokenlake.schema import generate_sequences
    from tokenlake.session import get_spark

    small_scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run_ops(df):
        # force full execution of both operators with a tiny collected agg
        is_eval = F.xxhash64("doc_id") % 100 == 0
        prof = tokenops.span_dedup(df, n=16, stride=8)
        a = prof.agg(
            F.sum("n_spans").alias("spans"), F.sum("dup_spans").alias("dups")
        ).collect()[0]
        cont = tokenops.contamination(df.filter(~is_eval), df.filter(is_eval), n=16, stride=8)
        b = cont.agg(F.sum(F.col("contaminated").cast("long")).alias("c")).collect()[0]
        return int(a["spans"] or 0), int(a["dups"] or 0), int(b["c"] or 0)

    out = {"metric": "tokenops_weak_scaling", "cpus": int(cpus), "mult": mult,
           "iters": iters, "gauge_start": host_gauge()}
    sizes = {}
    for tag, scale in (("small", small_scale), ("big", small_scale * mult)):
        df = spark.createDataFrame(generate_sequences(scale=scale)).cache()
        rows = df.count()
        toks = df.agg(F.sum("n_tok")).collect()[0][0]
        walls = []
        checks = None
        for _ in range(iters):
            t0 = time.perf_counter()
            checks = run_ops(df)
            walls.append(round(time.perf_counter() - t0, 3))
        df.unpersist()
        sizes[tag] = {"rows": rows, "tokens": int(toks), "walls": walls,
                      "wall_lo": min(walls), "spans": checks[0],
                      "dup_spans": checks[1], "contaminated_docs": checks[2],
                      "tokens_per_s_lo": int(toks / min(walls))}
    out.update({f"{k}_{f}": v for k, s in sizes.items() for f, v in s.items()})
    eff = mult * sizes["small"]["wall_lo"] / sizes["big"]["wall_lo"]
    out["weak_scaling_efficiency"] = round(eff, 3)
    out["gauge_end"] = host_gauge()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
