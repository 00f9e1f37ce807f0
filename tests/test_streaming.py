"""Structured-Streaming ingest tests: files → micro-batch encode → decode,
bit-identical, with the second file drop picked up incrementally."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tokenlake import decode_job, streaming
from tokenlake.schema import generate_sequences
from tokenlake.verify import verify_bit_identical


@pytest.fixture()
def stream_dirs(tmp_path):
    inp = tmp_path / "incoming"
    out = tmp_path / "out"
    inp.mkdir()
    return str(inp), str(out)


def _drop_file(inp: str, name: str, profiles, scale=0.01):
    tbl = generate_sequences(scale=scale, profiles=profiles, skew=False)
    pq.write_table(tbl, os.path.join(inp, name))
    return tbl.num_rows


def test_stream_encode_two_drops_bit_identical(spark, stream_dirs):
    inp, out = stream_dirs
    n1 = _drop_file(inp, "part1.parquet", ["lowcard", "runs"])
    q = streaming.encode_stream(spark, inp, out)
    q.awaitTermination(120)
    dec1 = decode_job.decode(spark, out)
    assert dec1.count() == n1

    # second drop: a new file arrives; a fresh availableNow pass (same
    # checkpoint) must encode ONLY the new file, into new salted chunks
    n2 = _drop_file(inp, "part2.parquet", ["sorted_ts", "ngram"])
    q2 = streaming.encode_stream(spark, inp, out)
    q2.awaitTermination(120)

    src = spark.read.parquet(inp)
    dec = decode_job.decode(spark, out)
    assert dec.count() == n1 + n2
    result = verify_bit_identical(src, dec)
    assert result["pass"], result

    # chunk ids are batch-salted: source#b<batch>#bucket
    enc = spark.read.parquet(f"{out}/encoded")
    salts = {
        r["chunk_id"].split("#")[1]
        for r in enc.select("chunk_id").distinct().collect()
    }
    assert all(s.startswith("b") for s in salts)
    assert len(salts) >= 2  # two micro-batches


def test_dedup_stream_cross_batch_state(spark, stream_dirs):
    """applyInPandasWithState dedup: a second micro-batch that is a strict
    content subset of the first must contribute ZERO output rows — the seen
    state survives across batches."""
    from tokenlake.schema import SEQUENCES_SPARK_SCHEMA

    inp, out = stream_dirs
    tbl = generate_sequences(scale=0.01, profiles=["lowcard"], skew=False)
    pq.write_table(tbl, os.path.join(inp, "a.parquet"))
    pq.write_table(tbl.slice(0, 50), os.path.join(inp, "b.parquet"))  # all dups
    q = streaming.dedup_stream(spark, inp, out, max_files_per_trigger=1)
    q.awaitTermination(180)
    got = spark.read.parquet(f"{out}/deduped")
    n_hash = (
        spark.createDataFrame(tbl.to_pandas(), SEQUENCES_SPARK_SCHEMA)
        .select(F.md5(F.col("tokens").cast("string")))
        .distinct()
        .count()
    )
    assert got.count() == n_hash
    assert got.select("doc_id").distinct().count() == got.count()


def test_stream_rerun_is_idempotent(spark, stream_dirs):
    inp, out = stream_dirs
    _drop_file(inp, "only.parquet", ["smallrange"])
    streaming.encode_stream(spark, inp, out).awaitTermination(120)
    rows1 = decode_job.decode(spark, out).count()
    # re-running with the same checkpoint and no new files must be a no-op
    streaming.encode_stream(spark, inp, out).awaitTermination(120)
    enc = spark.read.parquet(f"{out}/encoded")
    assert decode_job.decode(spark, out).count() == rows1
    # no duplicate chunk payload rows
    dups = enc.groupBy("chunk_id").count().filter(F.col("count") > 1).count()
    assert dups == 0
