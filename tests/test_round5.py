"""Round-5 regression tests: ADVICE fixes (append dtype guard, pre-v3
metrics-struct tolerance, verify duplicate-null-key disambiguation,
lint_encoded mixed-unit/all-null tokens, str_prefix trailing-clamp), then
list-typed extras / per-column blooms / decimal as they land."""

import struct

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from tokenlake import decode_job, encode_job, lint_job
from tokenlake.schema import SEQUENCES_SPARK_SCHEMA, generate_sequences


def _df(spark, scale=0.01, profiles=("lowcard",)):
    tbl = generate_sequences(scale=scale, profiles=list(profiles), skew=False)
    return spark.createDataFrame(tbl.to_pandas(), schema=SEQUENCES_SPARK_SCHEMA)


# ------------------------------------------ str_prefix trailing-zero-overlap

def test_str_prefix_trailing_empty_keeps_full_prefix_run():
    """A trailing zero-overlap pair used to clamp the PRECEDING segment's
    reduceat range, undercounting its common prefix by one byte (round-4
    advice): ["abcd", "abcde", ""] must store prefix_len 4 for row 1, so
    the suffix stream is exactly "abcd" + "e" + "" = 5 bytes."""
    from tokenlake.codecs.strcodecs import dec_str_prefix, enc_str_prefix

    vals = ["abcd", "abcde", ""]
    body = enc_str_prefix(vals)
    assert dec_str_prefix(memoryview(body)).to_pylist() == vals  # exactness
    (suffix_len,) = struct.unpack_from("<I", body, 4)
    assert suffix_len == 5  # was 6 before the fix ("de" stored for row 1)
    # and a middle empty string still round-trips with correct prefixes
    vals2 = ["abcd", "", "abcd", "abcdX"]
    body2 = enc_str_prefix(vals2)
    assert dec_str_prefix(memoryview(body2)).to_pylist() == vals2
    (s2,) = struct.unpack_from("<I", body2, 4)
    assert s2 == len("abcd") + len("abcd") + 1  # row3 shares "abcd" with row2


# ------------------------------------------ verify: duplicate null-doc rows

def test_verify_bit_identical_duplicate_null_doc_rows(spark):
    """Two identical null-doc_id source rows vs ONE decoded copy must NOT
    certify bit-identical (the old many-to-many join double-counted the
    surviving copy — round-4 advice)."""
    from tokenlake.verify import verify_bit_identical

    row = (None, [1, 2, 3], 3, "s")
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    src = spark.createDataFrame([row, row], schema)
    dec = spark.createDataFrame([row], schema)
    r = verify_bit_identical(src, dec)
    assert r["matched"] == 1 and r["missing"] == 1 and not r["pass"]
    # equal multisets still pass
    r2 = verify_bit_identical(src, spark.createDataFrame([row, row], schema))
    assert r2["pass"] and r2["matched"] == 2


# ------------------------------------------ lint_encoded: units + all-null

def test_lint_encoded_all_null_tokens_chunk_is_ok(spark, tmp_path):
    """An all-null tokens chunk stores n_values=0 with null ROWS counted in
    null_count (value vs row units — round-4 advice); it must classify as
    the all-null 'ok' arm, not 'no-evidence'."""
    out = str(tmp_path / "out")
    df = _df(spark, scale=0.004)
    nulled = df.select(
        "doc_id",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        "source",
    )
    encode_job.run(spark, nulled, out, resume=False)
    d = lint_job.lint_encoded(spark, out)
    rules = {r["rule"] for r in d.filter(F.col("column") == "tokens").collect()}
    assert rules == {"ok"}


def _fake_encoded_with_metrics(spark, out, colmeta_rows):
    """Write a minimal encoded table whose `columns` metrics are fabricated
    (payloads never read by the evidence lint)."""
    row = {
        "chunk_id": "s#0", "n_rows": 1, "n_values": 1, "encoded_bytes": 1,
        "raw_bytes": 1, "doc_id_min": "", "doc_id_max": "", "stats_exact": False,
        "input_fingerprint": "x", "elapsed_ms": 0.0, "nbuckets": 1, "bloom": None,
        "columns": colmeta_rows,
        "payload_tokens": b"", "payload_n_tok": b"", "payload_doc_id": b"",
        "payload_source": b"",
    }
    import os

    import pyarrow.parquet as pq

    t = pa.Table.from_pylist([row], schema=encode_job.encoded_arrow_schema())
    os.makedirs(f"{out}/encoded", exist_ok=True)
    pq.write_table(t, f"{out}/encoded/part-0.parquet")


def _meta(column, dtype, codec, n_values, distinct_est, null_count=0):
    return {
        "column": column, "codec": codec, "outer": "none", "dtype": dtype,
        "n_values": n_values, "null_count": null_count, "encoded_bytes": 1,
        "raw_bytes": 1, "rule": "", "min_val": 0, "max_val": 1,
        "distinct_est": distinct_est, "elapsed_ms": 0.0,
    }


def test_lint_encoded_wide_dtype_dictionary_estimate(spark, tmp_path):
    """The dictionary-table overflow estimate must use 8 B/entry for wide
    int-family columns (bigint/timestamp): distinct_est = 2M entries is
    20 MB > 16 MB as bigint (overflow) but only 10 MB as int (ok)."""
    out = str(tmp_path / "out")
    ndv = 2_000_000  # 8 B × 1.25 × 2M = 20 MB > 16 MB; 4 B × 1.25 × 2M = 10 MB
    _fake_encoded_with_metrics(
        spark,
        out,
        [
            _meta("wide_col", "bigint", "dict", n_values=100_000_000, distinct_est=ndv),
            _meta("narrow_col", "int", "dict", n_values=100_000_000, distinct_est=ndv),
        ],
    )
    d = lint_job.lint_encoded(spark, out)
    rules = {r["column"]: r["rule"] for r in d.collect()}
    assert rules["wide_col"] == "dictionary-overflow"
    assert rules["narrow_col"] == "ok"


# ------------------------------------------ append dtype guard

def test_append_with_diverged_extra_dtype_rejected(spark, tmp_path):
    """Same column NAMES but a changed extra type (double → float) must be
    refused: mixed dtype metadata would break decode's single mapInArrow
    schema (round-4 advice)."""
    out = str(tmp_path / "out")
    df = _df(spark, scale=0.003).withColumn("value", F.lit(1.5))
    encode_job.run(spark, df, out, resume=False)
    bad = df.withColumn("value", F.col("value").cast("float"))
    with pytest.raises(ValueError, match="append type mismatch"):
        encode_job.run(spark, bad, out, salt="b2")
    # identical types append fine
    encode_job.run(spark, df, out, salt="b3")
    assert decode_job.extra_types_of(
        decode_job.read_encoded(spark, out)
    ) == {"value": "double"}


def test_extra_types_of_raises_on_conflicting_dtypes(spark):
    """A hand-mixed table storing two dtypes for one column must raise, not
    silently pick one (the decode schema would disagree with half the
    payloads)."""
    a = spark.createDataFrame(
        [("c1", [("v", "plain", "none", "double", 1, 0, 1, 1, "", 0, 1, 1, 0.0)], b"")],
        f"chunk_id string, columns array<struct<{encode_job.COLMETA_FIELDS}>>, payload_v binary",
    )
    b = spark.createDataFrame(
        [("c2", [("v", "plain", "none", "float", 1, 0, 1, 1, "", 0, 1, 1, 0.0)], b"")],
        f"chunk_id string, columns array<struct<{encode_job.COLMETA_FIELDS}>>, payload_v binary",
    )
    with pytest.raises(ValueError, match="conflicting dtypes"):
        decode_job.extra_types_of(a.unionByName(b))


# ------------------------------------------ pre-v3 metrics-struct tables

_OLD_COLMETA_FIELDS = (
    "column string, codec string, outer string, n_values long, "
    "encoded_bytes long, raw_bytes long, rule string, "
    "min_val long, max_val long, distinct_est long, elapsed_ms double"
)


def _downgrade_to_pre_v3(spark, src, dst):
    """Rewrite an encoded table with the round-3 metrics struct (no dtype /
    null_count fields) — the shape of tables written before v3 metadata."""
    enc = decode_job.dedup_attempts(decode_job.read_encoded(spark, src))
    old = enc.withColumn(
        "columns",
        F.expr(
            "transform(columns, c -> struct("
            "c.column as column, c.codec as codec, c.outer as outer, "
            "c.n_values as n_values, c.encoded_bytes as encoded_bytes, "
            "c.raw_bytes as raw_bytes, c.rule as rule, c.min_val as min_val, "
            "c.max_val as max_val, c.distinct_est as distinct_est, "
            "c.elapsed_ms as elapsed_ms))"
        ),
    ).drop("attempt")
    old.write.mode("overwrite").parquet(f"{dst}/encoded/attempt=1")
    spark.read.parquet(f"{src}/lineage").write.mode("overwrite").parquet(f"{dst}/lineage")


def test_pre_v3_metrics_struct_reads_and_refuses_appends(spark, tmp_path):
    """column_metrics / lint_encoded on a pre-v3 table coalesce dtype from
    the codec family (the unwrap() v2 fallback applied to metadata) instead
    of failing; run() refuses to append into such a table rather than mix
    metrics-struct schemas (round-4 advice)."""
    src, old = str(tmp_path / "src"), str(tmp_path / "old")
    df = _df(spark, scale=0.004)
    encode_job.run(spark, df, src, resume=False)
    _downgrade_to_pre_v3(spark, src, old)

    m = encode_job.column_metrics(spark.read.parquet(f"{old}/encoded"))
    got = {r["column"]: (r["dtype"], r["null_count"]) for r in m.collect()}
    assert got["tokens"] == ("array<int>", 0)
    assert got["n_tok"] == ("int", 0)
    assert got["doc_id"][0] == "string" and got["source"][0] == "string"
    # the evidence lint runs too (dtype feeds its int-family filter)
    assert lint_job.lint_encoded(spark, old).count() > 0
    # appends refuse rather than writing a widened struct next to old files
    with pytest.raises(ValueError, match="predates per-column dtype"):
        encode_job.run(spark, df, old, salt="b2")
