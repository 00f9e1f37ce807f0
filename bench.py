#!/usr/bin/env python3
"""tokenlake benchmark: encode → decode → verify at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ..., ...extras}

Input = deterministic synthetic sequences (tokenlake.schema profiles, scaled
to the sf) UNION sequences derived from the driver's documents.parquet via a
deterministic hash tokenizer — exactly the input_hint shape
(doc_id, tokens:array<int32>, n_tok, source).

Headline metrics (BASELINE.md targets):
- encode throughput (tokens/s and GB/s of raw token bytes)
- decode throughput
- compressed bytes vs `df.write.parquet` (snappy) on the same rows
- bit-identical verification pass

Two-parallelism scaling evidence: tokenlake/bench/scaling.py runs this file
at SPARK_GRAFT_CPUS=8 and =32 and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    synth_scale = sf * 10

    from pyspark.sql import functions as F

    from tokenlake import decode_job, encode_job
    from tokenlake.schema import (
        SEQUENCES_SPARK_SCHEMA,
        generate_sequences,
        sequences_from_documents,
    )
    from tokenlake.session import get_spark
    from tokenlake.verify import verify_bit_identical

    spark = get_spark(master=f"local[{cpus}]", app_name="tokenlake-bench")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="tokenlake_bench_")
    timings: dict[str, float] = {}
    extras: dict[str, object] = {}
    try:
        # ---- build input (not part of the timed encode path)
        t0 = time.perf_counter()
        synth = spark.createDataFrame(
            generate_sequences(scale=synth_scale).to_pandas(),
            schema=SEQUENCES_SPARK_SCHEMA,
        )
        docs = sequences_from_documents(spark, sf_dir)
        input_path = f"{workdir}/input"
        synth.unionByName(docs).write.parquet(input_path)
        seq = spark.read.parquet(input_path)
        n_rows, n_tokens, raw_bytes = seq.agg(
            F.count("*"), F.sum("n_tok"), F.sum(F.col("n_tok") * 4)
        ).first()
        timings["build_input"] = time.perf_counter() - t0

        # ---- encode (headline)
        t0 = time.perf_counter()
        summary = encode_job.run(spark, seq, f"{workdir}/out")
        timings["encode"] = time.perf_counter() - t0
        extras["chunks"] = summary["chunks"]
        extras["compressed_bytes"] = int(summary["encoded_bytes"])
        extras["raw_token_bytes"] = int(raw_bytes)
        extras["rows"] = int(n_rows)
        extras["tokens"] = int(n_tokens)
        extras["encode_tokens_per_s"] = round(n_tokens / timings["encode"])
        extras["encode_GBps"] = round(raw_bytes / timings["encode"] / 1e9, 4)

        # ---- decode (headline)
        t0 = time.perf_counter()
        decoded = decode_job.decode(spark, f"{workdir}/out")
        dec_tokens = decoded.agg(F.sum("n_tok")).first()[0]
        timings["decode"] = time.perf_counter() - t0
        extras["decode_tokens_per_s"] = round(dec_tokens / timings["decode"])
        extras["decode_GBps"] = round(dec_tokens * 4 / timings["decode"] / 1e9, 4)

        # ---- verify bit-identical
        t0 = time.perf_counter()
        result = verify_bit_identical(seq, decode_job.decode(spark, f"{workdir}/out"))
        timings["verify"] = time.perf_counter() - t0
        extras["bit_identical"] = bool(result["pass"])
        extras["verify_rows"] = int(result["rows"])

        # ---- parquet baseline (reference output: default snappy parquet)
        t0 = time.perf_counter()
        base_dir = f"{workdir}/baseline"
        seq.write.parquet(base_dir)
        parquet_bytes = sum(
            os.path.getsize(os.path.join(base_dir, f))
            for f in os.listdir(base_dir)
            if f.endswith(".parquet")
        )
        timings["parquet_baseline"] = time.perf_counter() - t0
        extras["parquet_baseline_bytes"] = parquet_bytes
        extras["bytes_vs_parquet"] = round(extras["compressed_bytes"] / parquet_bytes, 4)

        total = sum(timings.values())
        out = {
            "metric": "encode_decode_verify_pipeline",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf,
            "cpus": cpus,
            **extras,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
