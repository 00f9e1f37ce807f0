"""The decode job: encoded table → sequences, bit-identical.

Inverse of encode_job. Spark shape: scan encoded parquet (column-pruned to the
chunks requested) → groupBy(chunk_id) → applyInPandas(decode_chunk). Every
payload is self-describing (codecs/container.py) so decode needs no plan —
the reference's rewrite reads WriterProperties from the file footer the same
way (src/parquet-linter/src/fix.rs:25-70).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .codecs import decode_column

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def decode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """One chunk's 4 encoded rows → the chunk's original sequence rows."""
    # resume can leave duplicate (chunk_id, column) rows after a crash between
    # the encoded and lineage writes; content is deterministic → keep first
    pdf = pdf.drop_duplicates(subset=["column"], keep="first")
    by_col = {r["column"]: r["payload"] for _, r in pdf.iterrows()}
    lens = decode_column(by_col["n_tok"]).astype(np.int64)
    flat = decode_column(by_col["tokens"])
    doc_id = decode_column(by_col["doc_id"]).to_pandas()
    source = decode_column(by_col["source"]).to_pandas()
    bounds = np.cumsum(lens)[:-1] if len(lens) else []
    tokens = np.split(flat, bounds) if len(lens) else []
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": lens.astype(np.int32),
            "source": source,
        }
    )


def decode_dataframe(encoded: DataFrame) -> DataFrame:
    return encoded.groupBy("chunk_id").applyInPandas(
        lambda pdf: decode_chunk(pdf), DECODED_SCHEMA
    )


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/encoded")


def decode(spark: SparkSession, out_dir: str) -> DataFrame:
    return decode_dataframe(read_encoded(spark, out_dir))
