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


def host_gauge(procs: int = 16, iters: int = 6_000_000) -> dict:
    """Inline host-interference probe (pure-python ALU burn, no Spark).

    This sandbox VM shares hardware with external load that varies multi-×
    hour to hour; wall-clock regressions here are not attributable to the
    engine without same-run evidence. Reports the single-process burn time
    and the effective core count when `procs` processes burn concurrently —
    on a quiet 32-vCPU host effective_cores ≈ procs; interference shows up
    as effective_cores ≪ procs and/or an inflated single_s."""
    import multiprocessing as mp

    def _burn(q):
        t = time.perf_counter()
        x = 0
        for i in range(iters):
            x += i * i
        q.put(time.perf_counter() - t)

    ctx = mp.get_context("fork")
    q: mp.queues.Queue = ctx.Queue()
    _burn(q)
    single = q.get()
    ps = [ctx.Process(target=_burn, args=(q,)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    del res
    return {
        "single_s": round(single, 3),
        "procs": procs,
        "effective_cores": round(procs * single / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    synth_scale = sf * 10

    from pyspark.sql import functions as F

    from tokenlake import decode_job, encode_job
    from tokenlake.schema import generate_sequences, sequences_from_documents
    from tokenlake.session import get_spark
    from tokenlake.verify import verify_bit_identical, verify_by_hash

    spark = get_spark(master=f"local[{cpus}]", app_name="tokenlake-bench")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="tokenlake_bench_")
    timings: dict[str, float] = {}
    extras: dict[str, object] = {}
    extras["host_gauge_start"] = host_gauge()
    try:
        # ---- build input (not part of the timed encode path)
        t0 = time.perf_counter()
        input_path = f"{workdir}/input"
        os.makedirs(input_path)
        # synth rows: straight pyarrow write (a driver-side detour through
        # pandas object-lists is ~10× slower for array columns)
        import pyarrow.parquet as pq

        # small row groups keep the file splittable: one giant row group would
        # collapse the downstream scan to a single task
        pq.write_table(
            generate_sequences(scale=synth_scale),
            f"{input_path}/synth.parquet",
            row_group_size=8192,
        )
        docs = sequences_from_documents(spark, sf_dir)
        docs.write.mode("append").parquet(input_path)
        seq = spark.read.parquet(input_path)
        n_rows, n_tokens, raw_bytes = seq.agg(
            F.count("*"), F.sum("n_tok"), F.sum(F.col("n_tok") * 4)
        ).first()
        timings["build_input"] = time.perf_counter() - t0

        # Timed phases run best-of-N (reference leaderboard measures best-of-3,
        # src/parquet-linter-leaderboard/src/benchmark.rs:16-42) — this sandbox
        # host has multi-× run-to-run CPU variance, so a single sample is noise.
        iters = int(os.environ.get("SPARK_GRAFT_ITERS", "3"))

        # optional plan override (e.g. SPARK_GRAFT_OUTER="zlib(9)" forces the
        # general-purpose outer layer — the compute-bound scaling probe)
        cfg = None
        outer = os.environ.get("SPARK_GRAFT_OUTER")
        if outer:
            from tokenlake.plan import Prescription

            cfg = Prescription.parse(f"set file compression {outer}").apply()
            extras["outer"] = outer

        # ---- encode (headline); fresh out dir per iter (resume would skip)
        enc_times = []
        summary = None
        for i in range(iters):
            t0 = time.perf_counter()
            s = encode_job.run(spark, seq, f"{workdir}/out{i}", cfg=cfg)
            enc_times.append(time.perf_counter() - t0)
            summary = summary or s
        best = enc_times.index(min(enc_times))
        out_dir = f"{workdir}/out{best}"
        timings["encode"] = min(enc_times)
        extras["encode_s_all"] = [round(t, 3) for t in enc_times]
        # scheduler-utilization evidence: Σ in-UDF chunk CPU vs cores × wall.
        # High utilization + inflated per-chunk times ⇒ the limiter is shared
        # hardware (memory bandwidth), not task scheduling/coordination.
        udf_cpu = (
            spark.read.parquet(f"{out_dir}/encoded")
            .agg(F.sum("elapsed_ms")).first()[0] or 0.0
        ) / 1000.0
        extras["encode_udf_cpu_s"] = round(udf_cpu, 3)
        extras["encode_sched_utilization"] = round(udf_cpu / (cpus * min(enc_times)), 4)
        extras["chunks"] = summary["chunks"]
        extras["compressed_bytes"] = int(summary["encoded_bytes"])
        extras["raw_token_bytes"] = int(raw_bytes)
        extras["rows"] = int(n_rows)
        extras["tokens"] = int(n_tokens)
        extras["encode_tokens_per_s"] = round(n_tokens / timings["encode"])
        extras["encode_GBps"] = round(raw_bytes / timings["encode"] / 1e9, 4)

        # ---- decode (headline)
        dec_times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            decoded = decode_job.decode(spark, out_dir)
            dec_tokens = decoded.agg(F.sum("n_tok")).first()[0]
            dec_times.append(time.perf_counter() - t0)
        timings["decode"] = min(dec_times)
        extras["decode_s_all"] = [round(t, 3) for t in dec_times]
        extras["decode_tokens_per_s"] = round(dec_tokens / timings["decode"])
        extras["decode_GBps"] = round(dec_tokens * 4 / timings["decode"] / 1e9, 4)

        # ---- verify (includes its own decode pass). Default is the digest
        # path (per-source count + sum of row hashes — the shape that stays
        # one pass at 10^12 rows; a differing row flips it w.p. 1 - 2^-64).
        # SPARK_GRAFT_EXACT_VERIFY=1 runs the exact full-outer-join
        # certificate instead (pytest runs it on every pipeline test).
        t0 = time.perf_counter()
        if os.environ.get("SPARK_GRAFT_EXACT_VERIFY"):
            result = verify_bit_identical(seq, decode_job.decode(spark, out_dir))
            extras["verify_mode"] = "exact_join"
        else:
            result = verify_by_hash(seq, decode_job.decode(spark, out_dir))
            extras["verify_mode"] = "hash_digest"
        timings["verify"] = time.perf_counter() - t0
        extras["verify_pass"] = bool(result["pass"])
        if extras["verify_mode"] == "exact_join":
            # only the exact join is a per-row certificate; the digest path is
            # a probabilistic per-source count+hash-sum equality
            extras["bit_identical"] = bool(result["pass"])
        extras["verify_rows"] = int(result["rows"])

        # ---- parquet baseline (reference output: default snappy parquet)
        base_times = []
        for i in range(iters):
            base_dir = f"{workdir}/baseline{i}"
            t0 = time.perf_counter()
            seq.write.parquet(base_dir)
            base_times.append(time.perf_counter() - t0)
        timings["parquet_baseline"] = min(base_times)
        parquet_bytes = sum(
            os.path.getsize(os.path.join(f"{workdir}/baseline0", f))
            for f in os.listdir(f"{workdir}/baseline0")
            if f.endswith(".parquet")
        )
        extras["parquet_baseline_bytes"] = parquet_bytes
        extras["bytes_vs_parquet"] = round(extras["compressed_bytes"] / parquet_bytes, 4)

        # headline value = the ENGINE phases; input synthesis and the
        # parquet-baseline write are itemized in `queries` but not charged to
        # the engine (build_input alone is ~60% of wall and is pure test rig)
        extras["host_gauge_end"] = host_gauge()
        engine_phases = ("encode", "decode", "verify")
        total = sum(timings[k] for k in engine_phases)
        out = {
            "metric": "encode_decode_verify_pipeline",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "value_phases": list(engine_phases),
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
