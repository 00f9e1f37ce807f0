#!/usr/bin/env python3
"""Phase-isolation profiler for the bench pipeline (guide §1.4: noop-sink
isolation; §1.5: labeled jobs). NOT the driver's bench — bench.py stays the
frozen measurement; this file exists to attribute the wall inside each timed
phase so optimization targets the real cost.

Prints one JSON line with per-sub-step seconds:
  encode: bucket-plan agg | encode+write | lineage derivation | summary agg
  decode: plan/setup overhead | decode compute (noop) | the bench's sum agg
  verify: digest(source) | digest(decoded) | overlap potential

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py
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

    from pyspark.sql import functions as F

    from tokenlake import decode_job, encode_job
    from tokenlake.chunking import assign_chunks, plan_buckets
    from tokenlake.schema import generate_sequences, sequences_from_documents
    from tokenlake.session import get_spark
    from tokenlake.verify import verify_by_hash

    spark = get_spark(master=f"local[{cpus}]", app_name="tokenlake-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    workdir = tempfile.mkdtemp(prefix="tokenlake_bextra_")
    t: dict[str, float] = {}

    def timed(name: str, fn, iters: int = 1):
        best = None
        for _ in range(iters):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        sc.setJobDescription(None)
        t[name] = round(best, 3)
        return out

    try:
        input_path = f"{workdir}/input"
        os.makedirs(input_path)
        import pyarrow.parquet as pq

        pq.write_table(
            generate_sequences(scale=sf * 10),
            f"{input_path}/synth.parquet",
            row_group_size=8192,
        )
        sequences_from_documents(spark, sf_dir).write.mode("append").parquet(input_path)
        seq = spark.read.parquet(input_path)

        # ---- warmup: one full encode (python workers, codegen, JIT)
        encode_job.run(spark, seq, f"{workdir}/warm")

        # ---- encode sub-steps (each best-of-2)
        timed("enc.bucket_plan", lambda: plan_buckets(seq).collect(), iters=2)
        buckets = plan_buckets(seq)

        def enc_noop():
            enc = encode_job.encode_dataframe(seq, buckets=buckets)
            enc.write.format("noop").mode("overwrite").save()

        timed("enc.encode_noop", enc_noop, iters=2)

        def enc_write(i=[0]):
            i[0] += 1
            encode_job.run(spark, seq, f"{workdir}/out{i[0]}")

        timed("enc.full_run", enc_write, iters=2)
        out_dir = f"{workdir}/out1"

        committed = spark.read.schema(encode_job.encoded_schema_ddl()).parquet(
            f"{out_dir}/encoded/attempt=1"
        )
        timed(
            "enc.lineage_job",
            lambda: encode_job.lineage_from_encoded(committed, 1)
            .write.mode("overwrite")
            .parquet(f"{workdir}/lin_probe"),
            iters=2,
        )
        timed(
            "enc.summary_agg",
            lambda: spark.read.parquet(f"{out_dir}/lineage")
            .filter(F.col("status") == "complete")
            .agg(
                F.countDistinct("chunk_id"),
                F.sum("encoded_bytes"),
                F.sum("raw_bytes"),
            )
            .first(),
            iters=2,
        )

        # ---- decode sub-steps
        timed("dec.plan_setup", lambda: decode_job.decode(spark, out_dir), iters=2)
        timed(
            "dec.noop",
            lambda: decode_job.decode(spark, out_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            iters=2,
        )
        timed(
            "dec.bench_shape",
            lambda: decode_job.decode(spark, out_dir).agg(F.sum("n_tok")).first(),
            iters=2,
        )

        # ---- verify sub-steps
        cols = sorted(set(seq.columns) & set(decode_job.decode(spark, out_dir).columns))

        def digest(df):
            h = F.xxhash64(*cols).cast("decimal(38,0)")
            return df.groupBy("source").agg(F.count("*"), F.sum(h)).collect()

        timed("ver.digest_source", lambda: digest(seq), iters=2)
        timed(
            "ver.digest_decoded",
            lambda: digest(decode_job.decode(spark, out_dir)),
            iters=2,
        )
        timed(
            "ver.full",
            lambda: verify_by_hash(seq, decode_job.decode(spark, out_dir)),
            iters=2,
        )

        print(json.dumps({"metric": "bench_extra_phase_breakdown", "sf": sf, "cpus": cpus, "t": t}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
