"""The decode job: encoded table → sequences, bit-identical.

Inverse of encode_job. Spark shape (round-2 layout, one row per chunk):
scan encoded parquet → `mapInArrow(decode_batches)` — **no shuffle at all**.
The round-1 tall layout (4 per-column rows per chunk) needed a
groupBy(chunk_id) exchange that moved the entire compressed corpus just to
reassemble chunks; with per-column payloads as columns of one chunk row,
every row is self-contained and decode is embarrassingly parallel over scan
splits. Payloads are self-describing (codecs/container.py) so decode needs
no plan — the reference's rewrite reads WriterProperties from the file
footer the same way (src/parquet-linter/src/fix.rs:25-70).

Arrow-native: the decoded flat token stream becomes the list array's value
buffer directly (one ListArray.from_arrays call — no per-row splitting, no
pandas object columns). The only Python loop is per CHUNK (64 Ki rows), the
same granularity the encode UDF already works at.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from .codecs import decode_column

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
ALL_COLUMNS = ("doc_id", "tokens", "n_tok", "source")
# decode-side projection: which payloads each output column needs (`tokens`
# needs the length column to rebuild list offsets), and its Spark type
_COLUMN_PAYLOADS = {
    "doc_id": ("doc_id",),
    "tokens": ("tokens", "n_tok"),
    "n_tok": ("n_tok",),
    "source": ("source",),
}
_COLUMN_TYPES = {
    "doc_id": "string",
    "tokens": "array<int>",
    "n_tok": "int",
    "source": "string",
}


def _payloads_for(columns: tuple[str, ...]) -> list[str]:
    unknown = [c for c in columns if c not in _COLUMN_PAYLOADS]
    if unknown:
        raise ValueError(f"unknown decode columns {unknown}; valid: {list(ALL_COLUMNS)}")
    need: list[str] = []
    for c in columns:
        for p in _COLUMN_PAYLOADS[c]:
            if p not in need:
                need.append(p)
    return need


def decode_chunk_row(
    payloads: dict[str, bytes], columns: tuple[str, ...] = ALL_COLUMNS
) -> pa.Table:
    """One chunk's self-describing payloads → the original sequence rows.

    Only the payloads the requested `columns` need are decoded (the S3
    column-chunk-read analog applied to decode: at 10^12 rows a tokens-only
    reader must not pay for doc_id/source byte streams)."""
    lens = (
        decode_column(payloads["n_tok"]).astype(np.int64)
        if "n_tok" in payloads
        else None
    )
    arrays: dict[str, pa.Array] = {}
    for c in columns:
        if c == "doc_id":
            arrays[c] = decode_column(payloads["doc_id"]).cast(pa.string())
        elif c == "source":
            arrays[c] = decode_column(payloads["source"]).cast(pa.string())
        elif c == "n_tok":
            arrays[c] = pa.array(lens.astype(np.int32), type=pa.int32())
        elif c == "tokens":
            flat = decode_column(payloads["tokens"])
            offsets64 = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets64[1:], dtype=np.int64)
            if offsets64[-1] > np.iinfo(np.int32).max:
                # reachable only by overriding max_chunk_values far past the
                # default; fail loudly instead of letting an int32 cumsum wrap
                # into corrupt rows
                raise ValueError(
                    f"chunk token count {offsets64[-1]} overflows int32 list offsets"
                )
            arrays[c] = pa.ListArray.from_arrays(
                pa.array(offsets64.astype(np.int32), type=pa.int32()),
                pa.array(flat, type=pa.int32()),
            )
    return pa.table({c: arrays[c] for c in columns})


def decode_chunk(t: pa.Table) -> pa.Table:
    """Decode a table of encoded chunk rows (kernel entry; also usable
    standalone on a driver-side pyarrow table)."""
    parts = []
    for i in range(t.num_rows):
        parts.append(
            decode_chunk_row(
                {
                    c: t.column(f"payload_{c}")[i].as_py()
                    for c in ("tokens", "n_tok", "doc_id", "source")
                }
            )
        )
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "n_tok": pa.array([], pa.int32()),
                "source": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(parts)


def decode_dataframe(
    encoded: DataFrame, columns: tuple[str, ...] | list[str] | None = None
) -> DataFrame:
    """Shuffle-free decode: column-pruned scan → mapInArrow.

    `columns` projects the decode: only the payload columns those outputs
    need are scanned (parquet column pruning skips the rest entirely) and
    decoded. Default = all four sequence columns."""
    cols = tuple(columns) if columns is not None else ALL_COLUMNS
    need = _payloads_for(cols)
    schema = ", ".join(f"{c} {_COLUMN_TYPES[c]}" for c in cols)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            t = pa.Table.from_batches([batch])
            for i in range(t.num_rows):
                out = decode_chunk_row(
                    {c: t.column(f"payload_{c}")[i].as_py() for c in need},
                    cols,
                )
                yield from out.to_batches()

    return encoded.select(*[f"payload_{p}" for p in need]).mapInArrow(fn, schema)


def dedup_attempts(encoded: DataFrame) -> DataFrame:
    """Drop duplicate chunk rows left by a crash between the encoded and
    lineage writes followed by a resume (the duplicate lands in a later
    `attempt=N` partition; content is deterministic). Keep each chunk's
    earliest attempt. The dedup reads only (chunk_id, attempt) — parquet
    column pruning keeps it metrics-weight — and rejoins as a BROADCAST
    left-semi, so payload bytes are never shuffled. No-op (and plan-free)
    when the input has no attempt partition column (e.g. the lazy output of
    encode_dataframe, which is duplicate-free by construction)."""
    if "attempt" not in encoded.columns:
        return encoded
    keep = (
        encoded.select("chunk_id", "attempt")
        .groupBy("chunk_id")
        .agg(F.min("attempt").alias("attempt"))
    )
    return encoded.join(F.broadcast(keep), ["chunk_id", "attempt"], "left_semi")


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/encoded")


def decode(
    spark: SparkSession,
    out_dir: str,
    columns: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    return decode_dataframe(dedup_attempts(read_encoded(spark, out_dir)), columns)


def chunks_containing_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """Chunk ids whose token bloom filter admits `token` (parity with the
    reference's bloom directives, prescription.rs:113-130 / fix.rs:168-182).

    Chunks encoded without a filter can't be pruned and are kept. The probe
    is an Arrow-batched pandas UDF over (chunk_id, bloom) only — parquet
    column pruning keeps payload bytes unread."""
    from pyspark.sql.functions import pandas_udf

    from .codecs.bloom import might_contain

    @pandas_udf("boolean")
    def probe(blooms: pd.Series) -> pd.Series:
        return blooms.map(lambda b: True if b is None else might_contain(b, token))

    enc = read_encoded(spark, out_dir)
    return enc.filter(probe(F.col("bloom"))).select("chunk_id")


def scan_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """All rows whose token array contains `token`, decoding only chunks the
    bloom filters admit (semi-join — candidate sets never hit the driver)."""
    cands = chunks_containing_token(spark, out_dir, token)
    pruned = dedup_attempts(
        read_encoded(spark, out_dir).join(cands, "chunk_id", "left_semi")
    )
    return decode_dataframe(pruned).filter(F.array_contains("tokens", F.lit(int(token))))


def lookup(spark: SparkSession, out_dir: str, doc_ids: list[str]) -> DataFrame:
    """Point lookup: decode ONLY the chunks that can contain a requested id.

    Chunk assignment is a pure function of the data (`prefix # xxhash64(doc_id)
    % nbuckets`, chunking.py), and every chunk row carries its group's
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
    pruned = dedup_attempts(enc.filter(F.col("chunk_id").isin(cands)))
    return decode_dataframe(pruned).filter(F.col("doc_id").isin(list(doc_ids)))
