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
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

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
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:], dtype=np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
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
