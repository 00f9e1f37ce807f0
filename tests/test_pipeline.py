"""End-to-end encode→decode pipeline tests (SURVEY.md §5 categories 4-5,
FIXTURES.md §4 invariants 1-3) + resumability (north_rule)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokenlake import decode_job, encode_job
from tokenlake.schema import SEQUENCES_SPARK_SCHEMA, generate_sequences
from tokenlake.verify import verify_bit_identical, verify_by_hash

SCALE = 0.02  # ~4.5k rows across all profiles


@pytest.fixture(scope="module")
def seq_df(spark):
    tbl = generate_sequences(scale=SCALE)
    df = spark.createDataFrame(tbl.to_pandas(), schema=SEQUENCES_SPARK_SCHEMA)
    df.cache().count()
    return df


def test_roundtrip_bit_identical(spark, seq_df, tmp_out):
    summary = encode_job.run(spark, seq_df, tmp_out, max_rows=2000, max_values=500_000)
    assert summary["chunks"] > 4  # multiple chunks exercised
    decoded = decode_job.decode(spark, tmp_out)
    result = verify_bit_identical(seq_df, decoded)
    assert result["pass"], result


def test_verify_by_hash_agrees_and_detects(spark, seq_df, tmp_out):
    """Scale-path verifier: passes on an honest roundtrip, fails when a row
    is tampered with (single-token flip) — same verdicts as the exact join."""
    encode_job.run(spark, seq_df, tmp_out, max_rows=2000, max_values=500_000)
    decoded = decode_job.decode(spark, tmp_out)
    ok = verify_by_hash(seq_df, decoded)
    assert ok["pass"], ok
    tampered = decoded.withColumn(
        "tokens",
        F.when(
            F.col("doc_id") == "lowcard-000000000000",
            F.concat(F.array(F.lit(999)), F.slice("tokens", 2, 1_000_000)),
        ).otherwise(F.col("tokens")),
    )
    bad = verify_by_hash(seq_df, tampered)
    assert not bad["pass"] and bad["mismatched_sources"] == ["lowcard"], bad


def test_compressed_leq_parquet_baseline(spark, seq_df, tmp_out, tmp_path):
    """FIXTURES.md invariant 2: sum(encoded_bytes) ≤ df.write.parquet bytes."""
    encode_job.run(spark, seq_df, tmp_out, max_rows=4000, max_values=2_000_000)
    enc = spark.read.parquet(f"{tmp_out}/encoded")
    total = enc.agg(F.sum("encoded_bytes")).first()[0]
    base_dir = str(tmp_path / "baseline_parquet")
    seq_df.write.parquet(base_dir)
    base = sum(
        os.path.getsize(os.path.join(base_dir, f))
        for f in os.listdir(base_dir)
        if f.endswith(".parquet")
    )
    assert total <= base, f"encoded {total} > parquet baseline {base}"


def test_expected_codecs_selected(spark, seq_df, tmp_out):
    """FIXTURES.md invariant 5 at the pipeline level: per-source winning codec
    on the tokens column matches the profile expectation."""
    encode_job.run(spark, seq_df, tmp_out, max_rows=100_000, max_values=50_000_000)
    enc = encode_job.column_metrics(spark.read.parquet(f"{tmp_out}/encoded"))
    rows = (
        enc.filter(F.col("column") == "tokens")
        .withColumn("source", F.split("chunk_id", "#")[0])
        .select("source", "codec")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r["source"], set()).add(r["codec"])
    assert got["lowcard"] == {"dict"}
    assert got["runs"] == {"rle"}
    assert got["sorted_ts"] == {"delta"}
    assert got["ngram"] == {"fsst"}
    assert got["random"] == {"plain"}


def test_resume_skips_completed(spark, seq_df, tmp_out):
    """North_rule resumability: second run encodes nothing new, and a partial
    first run (subset of sources) is completed — not redone — by the second."""
    part1 = seq_df.filter(F.col("source").isin("lowcard", "runs"))
    s1 = encode_job.run(spark, part1, tmp_out, max_rows=2000, max_values=500_000)
    assert s1["skipped_chunks"] == 0
    s2 = encode_job.run(spark, seq_df, tmp_out, max_rows=2000, max_values=500_000)
    assert s2["skipped_chunks"] == s1["chunks"]  # all of part1 skipped
    assert s2["attempt"] == 2
    # full decode after resumed run is still bit-identical
    decoded = decode_job.decode(spark, tmp_out)
    result = verify_bit_identical(seq_df, decoded)
    assert result["pass"], result
    # idempotent third run: nothing left to encode
    s3 = encode_job.run(spark, seq_df, tmp_out, max_rows=2000, max_values=500_000)
    assert s3["skipped_chunks"] == s3["chunks"] == s2["chunks"]


def test_lineage_metrics_complete(spark, seq_df, tmp_out):
    """R8 analog (missing-page-statistics): every chunk must have a lineage
    row with fingerprint + bytes + codec summary (metrics completeness)."""
    encode_job.run(spark, seq_df, tmp_out, max_rows=2000, max_values=500_000)
    lin = spark.read.parquet(f"{tmp_out}/lineage")
    enc = spark.read.parquet(f"{tmp_out}/encoded")
    n_chunks = enc.select("chunk_id").distinct().count()
    good = lin.filter(
        (F.col("status") == "complete")
        & F.col("input_fingerprint").isNotNull()
        & (F.col("encoded_bytes") > 0)
        & F.col("codec_summary").contains("tokens:")
    ).count()
    assert good == n_chunks
