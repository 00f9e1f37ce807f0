"""The decode job: encoded table → sequences, bit-identical.

Inverse of encode_job. Spark shape: scan encoded parquet (column-pruned to the
chunks requested) → groupBy(chunk_id) → applyInArrow(decode_chunk). Every
payload is self-describing (codecs/container.py) so decode needs no plan —
the reference's rewrite reads WriterProperties from the file footer the same
way (src/parquet-linter/src/fix.rs:25-70).

Arrow-native: the decoded flat token stream becomes the list array's value
buffer directly (one ListArray.from_arrays call — no per-row splitting, no
pandas object columns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from .codecs import decode_column

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def decode_chunk(t: pa.Table) -> pa.Table:
    """One chunk's 4 encoded rows → the chunk's original sequence rows."""
    # resume can leave duplicate (chunk_id, column) rows after a crash between
    # the encoded and lineage writes; content is deterministic → keep first
    cols = t.column("column").to_pylist()
    payloads = t.column("payload").to_pylist()
    by_col: dict[str, bytes] = {}
    for name, payload in zip(cols, payloads):
        by_col.setdefault(name, payload)
    lens = decode_column(by_col["n_tok"]).astype(np.int64)
    flat = decode_column(by_col["tokens"])
    doc_id = decode_column(by_col["doc_id"]).cast(pa.string())
    source = decode_column(by_col["source"]).cast(pa.string())
    offsets64 = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets64[1:], dtype=np.int64)
    if offsets64[-1] > np.iinfo(np.int32).max:
        # reachable only by overriding max_chunk_values far past the default;
        # fail loudly instead of letting an int32 cumsum wrap into corrupt rows
        raise ValueError(f"chunk token count {offsets64[-1]} overflows int32 list offsets")
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets64.astype(np.int32), type=pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
            "source": source,
        }
    )


def decode_dataframe(encoded: DataFrame) -> DataFrame:
    return encoded.groupBy("chunk_id").applyInArrow(
        lambda t: decode_chunk(t), DECODED_SCHEMA
    )


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/encoded")


def decode(spark: SparkSession, out_dir: str) -> DataFrame:
    return decode_dataframe(read_encoded(spark, out_dir))


def chunks_containing_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """Chunk ids whose token bloom filter admits `token` (parity with the
    reference's bloom directives, prescription.rs:113-130 / fix.rs:168-182).

    Chunks encoded without a filter can't be pruned and are kept. The probe
    is an Arrow-batched pandas UDF over the tiny metrics rows (one per chunk)
    — payloads are never read."""
    from pyspark.sql.functions import pandas_udf

    from .codecs.bloom import might_contain

    @pandas_udf("boolean")
    def probe(blooms: pd.Series) -> pd.Series:
        return blooms.map(lambda b: True if b is None else might_contain(b, token))

    enc = read_encoded(spark, out_dir).filter(F.col("column") == "tokens")
    return enc.filter(probe(F.col("bloom"))).select("chunk_id")


def scan_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """All rows whose token array contains `token`, decoding only chunks the
    bloom filters admit (semi-join — candidate sets never hit the driver)."""
    cands = chunks_containing_token(spark, out_dir, token)
    pruned = read_encoded(spark, out_dir).join(cands, "chunk_id", "left_semi")
    return decode_dataframe(pruned).filter(F.array_contains("tokens", F.lit(int(token))))


def lookup(spark: SparkSession, out_dir: str, doc_ids: list[str]) -> DataFrame:
    """Point lookup: decode ONLY the chunks that can contain a requested id.

    Chunk assignment is a pure function of the data (`prefix # xxhash64(doc_id)
    % nbuckets`, chunking.py), and every metrics row carries its group's
    nbuckets — so a doc's candidate chunk ids are recomputed exactly, with the
    same Spark hash, from the tiny distinct (prefix, nbuckets) set. The
    resulting `chunk_id IN (...)` predicate is pushed into the parquet scan of
    the encoded table (row-group pruning skips cold chunks without touching
    payloads), and only candidate chunks pay the decode UDF. At 10^12 rows a
    lookup touches O(#ids × #sources) chunks, not the corpus.
    """
    if not doc_ids:
        return decode(spark, out_dir).limit(0)
    enc = read_encoded(spark, out_dir)
    prefix = F.expr(
        "substring(chunk_id, 1, length(chunk_id)"
        " - length(element_at(split(chunk_id, '#'), -1)) - 1)"
    )
    groups = enc.select(prefix.alias("prefix"), "nbuckets").distinct()
    ids = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    cands = [
        r["cid"]
        for r in groups.crossJoin(F.broadcast(ids))
        .select(
            F.concat_ws(
                "#", "prefix", F.pmod(F.xxhash64("doc_id"), F.col("nbuckets"))
            ).alias("cid")
        )
        .distinct()
        .collect()
    ]
    pruned = enc.filter(F.col("chunk_id").isin(cands))
    return decode_dataframe(pruned).filter(F.col("doc_id").isin(list(doc_ids)))
