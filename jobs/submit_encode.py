#!/usr/bin/env python3
"""spark-submit entry point for the tokenlake encode→decode→verify pipeline.

The north-rule deploy shape (BASELINE.json: "run via spark-submit --py-files
on a multi-executor cluster at two cluster sizes"):

    python tools/make_pyfiles.py
    spark-submit --master <cluster-N>  --driver-memory 48g \
        --py-files dist/tokenlake-pyfiles.zip \
        jobs/submit_encode.py --input seq.parquet --output /data/out
    spark-submit --master <cluster-4N> --driver-memory 48g \
        --py-files dist/tokenlake-pyfiles.zip \
        jobs/submit_encode.py --input seq.parquet --output /data/out4

Size the driver on the spark-submit COMMAND LINE: under spark-submit the
driver JVM is already running when this script's builder executes, so the
library's `spark.driver.memory` config is silently too late — at the
default 1 g heap a `local[32]` run dies collecting task results (observed;
`local[8]` squeaked by). On a real cluster the executors do the heavy
lifting and `--executor-memory` / instance count come from the submit line
as usual.

This script never sets a master itself (`get_spark(master="")` inherits the
spark-submit / cluster-manager choice), so the SAME artifact runs at any
cluster size — the scaling-efficiency comparison is two invocations of this
file. In this sandbox the two "cluster sizes" are `--master local[8]` vs
`--master local[32]` (no real cluster exists here); see BENCH/BASELINE.md.

Input is a parquet directory of pre-tokenized sequences
(doc_id string, tokens array<int>, n_tok int, source string, + any extra
columns the generic registry covers); `--synth-scale` generates a
deterministic fixture instead when no input exists. Prints ONE JSON line
with per-phase wall, throughput, bytes, and the verify result — the same
fields bench.py reports, so the two surfaces are directly comparable.

Resume: re-submitting with the same --output continues from per-partition
lineage (completed chunks skip; the driver-side anti-join is the checkpoint
read path, encode_job.run). `--no-resume` encodes into a fresh attempt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo-root import fallback: under spark-submit the --py-files zip provides
# `tokenlake`; a bare `python jobs/submit_encode.py` run finds it one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="submit_encode",
        description="tokenlake encode/decode/verify pipeline for spark-submit",
    )
    p.add_argument("--input", help="sequences source (doc_id, tokens, n_tok, source, extras…): parquet dir, or an Iceberg table identifier with --format iceberg")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"],
                   help="input source format (iceberg needs the runtime jar + catalog config on the submit line)")
    p.add_argument("--snapshot-id", type=int, default=None,
                   help="pin an Iceberg snapshot so retries/resumes read a stable table")
    p.add_argument("--synth-scale", type=float, default=None,
                   help="generate the deterministic fixture at this scale instead of reading --input")
    p.add_argument("--output", required=True, help="encoded-table directory (encoded/ + lineage/)")
    p.add_argument("--phases", default="encode,decode,verify",
                   help="comma list from encode,decode,verify (default all)")
    p.add_argument("--plan", default=None, help="prescription DSL overriding codec selection")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing lineage (fresh attempt instead of checkpoint resume)")
    p.add_argument("--exact-verify", action="store_true",
                   help="full-outer-join per-row certificate instead of the hash digest")
    return p


def run_pipeline(spark, args) -> dict:
    from pyspark.sql import functions as F

    from tokenlake import decode_job, encode_job
    from tokenlake.verify import verify_bit_identical, verify_by_hash

    phases = [s.strip() for s in args.phases.split(",") if s.strip()]
    bad = set(phases) - {"encode", "decode", "verify"}
    if bad:
        raise SystemExit(f"unknown phase(s): {sorted(bad)}")

    if args.synth_scale is not None:
        # deterministic fixture written driver-side once, then read back so
        # every phase scans parquet exactly as a real corpus would
        import pyarrow.parquet as pq

        from tokenlake.schema import generate_sequences

        synth_dir = f"{args.output.rstrip('/')}_input"
        os.makedirs(synth_dir, exist_ok=True)
        pq.write_table(
            generate_sequences(scale=args.synth_scale),
            f"{synth_dir}/synth.parquet",
            row_group_size=8192,
        )
        input_path = synth_dir
    elif args.input:
        input_path = args.input
    else:
        raise SystemExit("one of --input / --synth-scale is required")

    from tokenlake.io_sources import read_sequences

    fmt = "parquet" if args.synth_scale is not None else args.format
    seq = read_sequences(spark, input_path, format=fmt, snapshot_id=args.snapshot_id)
    n_rows, n_tokens = seq.agg(F.count("*"), F.sum("n_tok")).first()

    cfg = None
    if args.plan:
        from tokenlake.plan import Prescription

        cfg = Prescription.parse(args.plan).apply()

    out: dict = {
        "metric": "submit_encode",
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "input": input_path,
        "output": args.output,
        "rows": int(n_rows),
        "tokens": int(n_tokens),
        "phases": {},
    }

    if "encode" in phases:
        t0 = time.perf_counter()
        summary = encode_job.run(
            spark, seq, args.output, cfg=cfg, resume=not args.no_resume
        )
        wall = time.perf_counter() - t0
        out["phases"]["encode"] = round(wall, 3)
        out["chunks"] = summary["chunks"]
        out["chunks_skipped_resume"] = summary.get("skipped_chunks", 0)
        out["compressed_bytes"] = int(summary["encoded_bytes"])
        out["encode_tokens_per_s"] = round(n_tokens / wall)
        out["encode_GBps"] = round(n_tokens * 4 / wall / 1e9, 4)

    if "decode" in phases:
        t0 = time.perf_counter()
        decoded = decode_job.decode(spark, args.output)
        dec_tokens = decoded.agg(F.sum("n_tok")).first()[0]
        wall = time.perf_counter() - t0
        out["phases"]["decode"] = round(wall, 3)
        out["decode_tokens_per_s"] = round(dec_tokens / wall)

    if "verify" in phases:
        t0 = time.perf_counter()
        decoded = decode_job.decode(spark, args.output)
        if args.exact_verify:
            result = verify_bit_identical(seq, decoded)
            out["verify_mode"] = "exact_join"
        else:
            result = verify_by_hash(seq, decoded)
            out["verify_mode"] = "hash_digest"
        out["phases"]["verify"] = round(time.perf_counter() - t0, 3)
        out["verify_pass"] = bool(result["pass"])
        out["verify_rows"] = int(result["rows"])

    return out


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    own = spark is None
    if own:
        from tokenlake.session import get_spark

        # master="" — inherit whatever spark-submit / the cluster gave us
        spark = get_spark(master="", app_name="tokenlake-submit")
        spark.sparkContext.setLogLevel("ERROR")
    try:
        out = run_pipeline(spark, args)
    finally:
        if own:
            spark.stop()
    print(json.dumps(out))
    return 0 if out.get("verify_pass", True) else 1


if __name__ == "__main__":
    sys.exit(main())
