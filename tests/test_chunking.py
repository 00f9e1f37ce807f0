"""Chunk planning unit tests — the R7 sizing-policy analog
(reference page_size.rs:121-166 tests the row-group suggestion math)."""

import pytest
from pyspark.sql import functions as F

from tokenlake.chunking import assign_chunks, plan_buckets
from tokenlake.schema import SEQUENCES_SPARK_SCHEMA, generate_sequences


@pytest.fixture(scope="module")
def seq_df(spark):
    tbl = generate_sequences(scale=0.02)  # skew=True: lowcard ×8
    df = spark.createDataFrame(tbl.to_pandas(), schema=SEQUENCES_SPARK_SCHEMA)
    df.cache().count()
    return df


def test_bucket_counts_follow_both_caps(spark, seq_df):
    got = {r["source"]: r["nbuckets"] for r in plan_buckets(seq_df, max_rows=100, max_values=10**12).collect()}
    rows = {r["source"]: r["rows"] for r in seq_df.groupBy("source").agg(F.count("*").alias("rows")).collect()}
    for s, n in got.items():
        assert n == max(1, -(-rows[s] // 100)), (s, n, rows[s])  # ceil(rows/100)
    # values-driven: huge row cap, small value cap
    got_v = {r["source"]: r["nbuckets"] for r in plan_buckets(seq_df, max_rows=10**9, max_values=50_000).collect()}
    vals = {r["source"]: r["v"] for r in seq_df.groupBy("source").agg(F.sum("n_tok").alias("v")).collect()}
    for s, n in got_v.items():
        assert n == max(1, -(-vals[s] // 50_000)), (s, n, vals[s])
    # everything fits → exactly 1 bucket
    one = {r["nbuckets"] for r in plan_buckets(seq_df, max_rows=10**9, max_values=10**12).collect()}
    assert one == {1}


def test_skewed_source_fans_out(spark, seq_df):
    """The ×8-boosted hot source must get ~proportionally more buckets —
    salting by construction; no single reducer sees the hot key."""
    b = {r["source"]: r["nbuckets"] for r in plan_buckets(seq_df, max_rows=200, max_values=10**12).collect()}
    assert b["lowcard"] >= 6 * b["random"]


def test_chunk_ids_deterministic_and_partition_independent(spark, seq_df):
    buckets = plan_buckets(seq_df, max_rows=500, max_values=10**12)
    a = {r["doc_id"]: r["chunk_id"] for r in assign_chunks(seq_df, buckets).collect()}
    b = {
        r["doc_id"]: r["chunk_id"]
        for r in assign_chunks(seq_df.repartition(17), buckets).collect()
    }
    assert a == b  # pure function of the data, not of Spark partitioning
    s = {
        r["doc_id"]: r["chunk_id"]
        for r in assign_chunks(seq_df, buckets, salt="b7").collect()
    }
    assert all(v.split("#")[1] == "b7" for v in s.values())
    assert set(s) == set(a)
