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


def test_lint_encoded_decimal128_dictionary_estimate(spark, tmp_path):
    """decimal128 dictionary entries are 16 B: distinct_est = 1M is 20 MB
    > 16 MB at 16 B/entry (overflow) but only 10 MB at the wide-int 8 B
    (ok) — pins the precision-aware entry width."""
    out = str(tmp_path / "out")
    ndv = 1_000_000  # 16 B × 1.25 × 1M = 20 MB; 8 B × 1.25 × 1M = 10 MB
    _fake_encoded_with_metrics(
        spark,
        out,
        [
            _meta("d128", "decimal(38,4)", "dict", n_values=100_000_000, distinct_est=ndv),
            _meta("d64", "decimal(14,2)", "dict", n_values=100_000_000, distinct_est=ndv),
        ],
    )
    d = lint_job.lint_encoded(spark, out)
    rules = {r["column"]: r["rule"] for r in d.collect()}
    assert rules["d128"] == "dictionary-overflow"
    assert rules["d64"] == "ok"


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
        [("c1", [("v", "plain", "none", "double", 1, 0, 1, 1, "", 0, 1, 1, 0.0, 0.0, 0, None)], b"")],
        f"chunk_id string, columns array<struct<{encode_job.COLMETA_FIELDS}>>, payload_v binary",
    )
    b = spark.createDataFrame(
        [("c2", [("v", "plain", "none", "float", 1, 0, 1, 1, "", 0, 1, 1, 0.0, 0.0, 0, None)], b"")],
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


# ------------------------------------------ list-typed extra columns

def _emb_df(spark, n=3000):
    """events → sequences + a ragged array<float> embedding extra (null
    rows planted) + an array<bigint> extra."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(n)
    toks = F.expr(
        "transform(sequence(1, cast(event_id % 7 as int) + 1), "
        "i -> cast((event_id * 31 + i) % 997 as int))"
    )
    # high-cardinality values (real-embedding shape): the R4 gate must
    # see distinct-ratio >= 0.1 and pick bss
    emb = F.expr(
        "transform(sequence(1, cast(event_id % 3 as int) + 2),"
        " i -> cast(((event_id * 2654435761 + i * 524287) % 1000003) / 64.0 as float))"
    )
    hist = F.expr(
        "transform(sequence(1, cast(event_id % 4 as int)),"
        " i -> event_id * 1000 + i)"
    )
    return ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(emb).alias("emb"),
        hist.alias("hist"),
    )


def test_list_extra_roundtrip_bit_identical(spark, tmp_path):
    """array<float> (ragged, null rows) and array<bigint> (incl. empty
    lists) extras encode→decode bit-identically through the stored table
    path — the round-4 verdict's top item."""
    out = str(tmp_path / "out")
    df = _emb_df(spark).cache()
    encode_job.run(spark, df, out, resume=False)
    et = decode_job.extra_types_of(decode_job.read_encoded(spark, out))
    assert et == {"emb": "array<float>", "hist": "array<bigint>"}
    dec = decode_job.decode(spark, out)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    bad = j.filter(
        ~F.col("a.emb").eqNullSafe(F.col("b.emb"))
        | ~F.col("a.hist").eqNullSafe(F.col("b.hist"))
        | (F.col("a.tokens") != F.col("b.tokens"))
    ).count()
    assert bad == 0
    # projected decode of just the embedding prunes the other payloads
    only = decode_job.decode(spark, out, columns=("doc_id", "emb"))
    assert only.columns == ["doc_id", "emb"]
    plan = only._jdf.queryExecution().executedPlan().toString()
    assert "payload_tokens" not in plan and "payload_hist" not in plan
    df.unpersist()


def test_list_extra_codec_choices(spark, tmp_path):
    """The flattened float embedding stream must land on the R4 bss codec
    (rules/vector_embedding.rs:19-76 finally feeding a real codec path);
    metrics count ELEMENTS in n_values and null ROWS in null_count."""
    out = str(tmp_path / "out")
    df = _emb_df(spark).cache()
    encode_job.run(spark, df, out, resume=False)
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out))
    rows = m.filter(F.col("column") == "emb").collect()
    assert rows and all(r["codec"] == "bss" for r in rows)
    assert all(r["dtype"] == "array<float>" for r in rows)
    n_null_rows = df.filter(F.col("emb").isNull()).count()
    n_elems = df.select(
        F.sum(F.when(F.col("emb").isNotNull(), F.size("emb"))).alias("s")
    ).first()["s"]
    agg = m.filter(F.col("column") == "emb").agg(
        F.sum("n_values").alias("v"), F.sum("null_count").alias("n")
    ).first()
    assert agg["v"] == n_elems and agg["n"] == n_null_rows
    # bigint list extra got an int-family codec with stats
    hrows = m.filter(F.col("column") == "hist").collect()
    assert all(r["dtype"] == "array<bigint>" for r in hrows)
    assert all(r["distinct_est"] > 0 for r in hrows if r["n_values"] > 0)
    df.unpersist()


def test_list_extra_lookup_and_compact(spark, tmp_path):
    """lookup() returns list extras; compaction re-encodes them intact."""
    out, dst = str(tmp_path / "out"), str(tmp_path / "dst")
    df = _emb_df(spark, n=800).cache()
    encode_job.run(spark, df, out, resume=False, max_rows=64)
    some = [r["doc_id"] for r in df.limit(3).collect()]
    got = decode_job.lookup(spark, out, some)
    assert set(got.columns) >= {"doc_id", "emb", "hist"}
    assert got.count() == 3
    r = encode_job.compact(spark, out, dst, max_rows=4096)
    assert r["chunks_after"] < r["chunks_before"]
    dec = decode_job.decode(spark, dst)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.emb").eqNullSafe(F.col("b.emb"))).count() == 0
    df.unpersist()


def test_property_list_column_roundtrip():
    """Container-level property test over ragged/empty/null list patterns
    for every element family (round-4 verdict #1's 'property test' half)."""
    from hypothesis import given, settings, strategies as st

    from tokenlake.codecs.container import decode_column_arrow, encode_list_column

    elem_types = {
        "int32": (pa.int32(), st.integers(-(2**31), 2**31 - 1)),
        "int64": (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
        "float32": (pa.float32(), st.floats(width=32, allow_nan=False)),
        "float64": (pa.float64(), st.floats(allow_nan=False)),
        "string": (pa.string(), st.text(max_size=20)),
        "bool": (pa.bool_(), st.booleans()),
    }

    @settings(max_examples=40, deadline=None)
    @given(
        key=st.sampled_from(sorted(elem_types)),
        data=st.lists(
            st.one_of(
                st.none(),
                st.lists(st.integers(0, 30), max_size=6),
            ),
            max_size=25,
        ),
        codec_hint=st.sampled_from(["plain", "for", "dict"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(key, data, codec_hint, seed):
        t, elem_strat = elem_types[key]
        rng = np.random.default_rng(seed)
        # refill the integer skeletons with values of the element type
        pool = elem_strat.example if False else None  # noqa: F841
        if key == "string":
            fill = lambda k: f"v{k % 7}"
        elif key == "bool":
            fill = lambda k: bool(k % 2)
        elif key.startswith("float"):
            fill = lambda k: float(k) / 4.0
        else:
            fill = lambda k: int(k) * 3 - 17
        rows = [None if r is None else [fill(k) for k in r] for r in data]
        # plant a null ELEMENT occasionally
        if rows and rows[0]:
            rows[0] = [None] + rows[0][1:]
        arr = pa.array(rows, pa.list_(t))
        codec = codec_hint
        if key in ("string",):
            codec = {"plain": "str_plain", "for": "str_prefix", "dict": "str_dict"}[codec_hint]
        if key == "bool" or key.startswith("float"):
            codec = "plain" if codec_hint != "for" else "for"
        if key.startswith("float") and codec_hint == "plain":
            codec = "bss"
        out = decode_column_arrow(encode_list_column(arr, codec))
        assert out.to_pylist() == arr.to_pylist()

    check()


# ------------------------------------------ decimal + fixed-size binary

def test_decimal_extra_roundtrip(spark, tmp_path):
    """A decimal(14,2) extra column (nulls planted) encodes through the
    int64 unscaled carrier and decodes bit-identically with its precision/
    scale intact (column_context.rs:215-291 parity, round-4 verdict #3)."""
    out = str(tmp_path / "out")
    df = (
        _df(spark, scale=0.004)
        .withColumn(
            "price",
            F.when(F.abs(F.xxhash64("doc_id")) % 7 == 0, F.lit(None)).otherwise(
                (F.abs(F.xxhash64("doc_id")) % 1000000 / 4.0).cast("decimal(14,2)")
            ),
        )
        .cache()
    )
    encode_job.run(spark, df, out, resume=False)
    et = decode_job.extra_types_of(decode_job.read_encoded(spark, out))
    assert et == {"price": "decimal(14,2)"}
    dec = decode_job.decode(spark, out)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.price").eqNullSafe(F.col("b.price"))).count() == 0
    # metrics row carries the exact DDL and real stats (unscaled carrier)
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out))
    rows = m.filter(F.col("column") == "price").collect()
    assert rows and all(r["dtype"] == "decimal(14,2)" for r in rows)
    assert all(r["distinct_est"] > 0 for r in rows if r["n_values"] > r["null_count"])
    df.unpersist()


def test_property_decimal_fsb_roundtrip():
    """Container-level property coverage for the two parameterized types."""
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    from tokenlake.codecs.container import decode_column_arrow, encode_any_column

    @settings(max_examples=40, deadline=None)
    @given(
        unscaled=st.lists(
            st.one_of(st.none(), st.integers(-(10**17), 10**17)), max_size=30
        ),
        scale=st.integers(0, 6),
        codec=st.sampled_from(["plain", "for", "dict", "delta"]),
    )
    def check_decimal(unscaled, scale, codec):
        vals = [None if u is None else Decimal(u).scaleb(-scale) for u in unscaled]
        arr = pa.array(vals, pa.decimal128(18, scale))
        out = decode_column_arrow(encode_any_column(arr, codec))
        assert out.to_pylist() == vals and out.type == arr.type

    @settings(max_examples=30, deadline=None)
    @given(
        width=st.integers(1, 24),
        n=st.integers(0, 30),
        codec=st.sampled_from(["str_plain", "str_dict", "str_prefix"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check_fsb(width, n, codec, seed):
        rng = np.random.default_rng(seed)
        vals = [
            None if rng.random() < 0.2 else rng.integers(0, 3, width).astype(np.uint8).tobytes()
            for _ in range(n)
        ]
        arr = pa.array(vals, pa.binary(width))
        out = decode_column_arrow(encode_any_column(arr, codec))
        assert out.to_pylist() == vals and out.type == arr.type

    check_decimal()
    check_fsb()


# ------------------------------------------ per-column bloom filters

def test_per_column_bloom_lookup_pruning(spark, tmp_path):
    """`set column doc_id bloom_filter true` builds a per-chunk doc_id
    membership filter that lookup() uses as a second pruning stage after
    the candidate semi-join (round-4 verdict #2): on a salted multi-batch
    table, the filter must reject most candidate chunks while returning
    exactly the requested rows."""
    from tokenlake.codecs.bloom import hash_string, might_contain_any
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    cfg = Prescription.parse("set column doc_id bloom_filter true").apply()
    df = _df(spark, scale=0.01).cache()
    # three salted batches over disjoint doc_id ranges → multiple prefixes,
    # small chunks
    ids = [r["doc_id"] for r in df.select("doc_id").distinct().collect()]
    ids.sort()
    third = len(ids) // 3
    for i, salt in enumerate(("b1", "b2", "b3")):
        part = ids[i * third : (i + 1) * third] if i < 2 else ids[2 * third :]
        encode_job.run(
            spark, df.filter(F.col("doc_id").isin(part)), out,
            cfg=cfg, salt=salt, max_rows=64,
        )
    want = [ids[1], ids[len(ids) // 2], ids[-2]]
    got = decode_job.lookup(spark, out, want)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(want)

    # pruning evidence: of the candidate chunks (3 prefixes × |want|
    # buckets), only the ones whose filter admits a requested id survive
    enc = decode_job.read_encoded(spark, out)
    import numpy as np

    id_hashes = np.array([hash_string(d) for d in want], dtype=np.int64)
    rows = (
        enc.select(
            "chunk_id",
            decode_job._column_bloom_expr(enc, "doc_id").alias("b"),
        )
        .collect()
    )
    assert all(r["b"] is not None for r in rows)  # every chunk has a filter
    admitted = sum(1 for r in rows if might_contain_any(bytes(r["b"]), id_hashes))
    assert admitted <= len(rows) / 2, (admitted, len(rows))
    df.unpersist()


def test_per_column_bloom_extras_and_inference(spark, tmp_path):
    """Extras (bigint) and n_tok honor bloom_filter directives;
    chunks_containing_value prunes on them; X1 inference round-trips the
    per-column bloom setting."""
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    cfg = Prescription.parse(
        "set column user_id bloom_filter true\nset column doc_id bloom_filter true"
    ).apply()
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(2000)
    toks = F.expr(
        "transform(sequence(1, cast(event_id % 7 as int) + 1), "
        "i -> cast((event_id * 31 + i) % 997 as int))"
    )
    df = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
        F.col("user_id").alias("user_id"),
    ).cache()
    encode_job.run(spark, df, out, cfg=cfg, resume=False, max_rows=256)
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out))
    hb = {
        r["column"]: r["h"]
        for r in m.groupBy("column").agg(F.max("has_bloom").alias("h")).collect()
    }
    assert hb["user_id"] and hb["doc_id"]
    assert not hb["tokens"] and not hb["source"]

    # value probe on the bigint extra prunes to a subset
    one_user = df.select("user_id").first()["user_id"]
    cands = decode_job.chunks_containing_value(spark, out, "user_id", int(one_user))
    total = decode_job.read_encoded(spark, out).count()
    n_cands = cands.count()
    assert 0 < n_cands < total, (n_cands, total)
    # and the admitted set really contains the user's rows
    dec = decode_job.decode(spark, out)
    rows_direct = df.filter(F.col("user_id") == one_user).count()
    pruned = decode_job.read_encoded(spark, out).join(cands, "chunk_id", "left_semi")
    rows_pruned = (
        decode_job.decode_dataframe(pruned, extra_types={"user_id": "bigint"})
        .filter(F.col("user_id") == one_user)
        .count()
    )
    assert rows_pruned == rows_direct

    inferred = encode_job.plan_from_encoded(spark, out)
    assert "user_id" in inferred.bloom and "doc_id" in inferred.bloom
    assert "tokens" not in inferred.bloom
    df.unpersist()


# ------------------------------------------ evidence → rewrite loop

def test_rewrite_from_evidence_selective(spark, tmp_path):
    """The lint→rewrite lifecycle on the engine's own format (cli/main.rs:
    186-199 analog): a two-source table — one force-plain (evidence:
    enable-dictionary), one already-dict — selectively re-encodes ONLY the
    flagged chunks; untouched chunks stay byte-identical, the evidence
    lint on the result is all-ok, and decode stays bit-identical."""
    from tokenlake.plan import Prescription
    from tokenlake.verify import verify_bit_identical

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _df(spark, scale=0.02, profiles=("lowcard", "smallrange")).cache()
    cfg = Prescription.parse("set column tokens encoding plain").apply()
    encode_job.run(spark, df, src, cfg=cfg, resume=False)
    ev = lint_job.lint_encoded(spark, src)
    flagged = {r["rule"] for r in ev.filter(F.col("column") == "tokens").collect()}
    assert "enable-dictionary" in flagged

    r = encode_job.rewrite_from_evidence(spark, src, dst)
    assert r["rewritten_chunks"] > 0
    assert "tokens" in r["flagged_columns"]

    # evidence on the result: no more enable/disable warnings
    ev2 = lint_job.lint_encoded(spark, dst)
    assert (
        ev2.filter(F.col("rule").isin("enable-dictionary", "disable-dictionary")).count()
        == 0
    )
    # decode bit-identical to the original rows
    dec = decode_job.decode(spark, dst)
    assert verify_bit_identical(df, dec)["pass"]
    df.unpersist()


def test_rewrite_from_evidence_keeps_untouched_bytes(spark, tmp_path):
    """Chunks without flagged evidence copy payload-byte-identically."""
    from tokenlake.plan import Prescription

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _df(spark, scale=0.02, profiles=("lowcard",))
    # only SOME chunks force-plain: encode two batches, one clean, one forced
    ids = sorted(r["doc_id"] for r in df.select("doc_id").distinct().collect())
    half = len(ids) // 2
    encode_job.run(spark, df.filter(F.col("doc_id").isin(ids[:half])), src, salt="a")
    cfg = Prescription.parse("set column tokens encoding plain").apply()
    encode_job.run(
        spark, df.filter(F.col("doc_id").isin(ids[half:])), src, cfg=cfg, salt="b"
    )
    before = {
        r["chunk_id"]: bytes(r["payload_tokens"])
        for r in decode_job.read_encoded(spark, src)
        .select("chunk_id", "payload_tokens")
        .collect()
    }
    r = encode_job.rewrite_from_evidence(spark, src, dst)
    assert 0 < r["rewritten_chunks"] < r["chunks_total"]
    after = {
        r["chunk_id"]: bytes(r["payload_tokens"])
        for r in decode_job.read_encoded(spark, dst)
        .select("chunk_id", "payload_tokens")
        .collect()
    }
    kept = set(before) & set(after)
    assert len(kept) == r["kept_chunks"]
    assert all(before[c] == after[c] for c in kept)  # byte-identical copies


def test_rewrite_from_evidence_noop_table(spark, tmp_path):
    """A table with no flagged evidence copies everything and encodes
    nothing. The fixture pins tokens to dict explicitly: at this scale the
    cardinality ratio is ~0.02, so R1's evidence tier approves dict but
    would flag the selector's own near-tie fsst pick (7 B apart) as
    enable-dictionary — the lifecycle converges on dict either way, and
    this test wants the already-converged state."""
    from tokenlake.plan import Prescription

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _df(spark, scale=0.005)
    cfg = Prescription.parse("set column tokens encoding dict").apply()
    encode_job.run(spark, df, src, cfg=cfg, resume=False)
    r = encode_job.rewrite_from_evidence(spark, src, dst)
    assert r["rewritten_chunks"] == 0 and r["kept_chunks"] == r["chunks_total"]
    assert decode_job.decode(spark, dst).count() == df.count()


def test_cli_rewrite_from_evidence(spark, tmp_path, capsys):
    from tokenlake.plan import Prescription
    from tokenlake import cli

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _df(spark, scale=0.01)
    cfg = Prescription.parse("set column tokens encoding plain").apply()
    encode_job.run(spark, df, src, cfg=cfg, resume=False)
    rc = cli.main(["rewrite", src, "-o", dst, "--from-evidence"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert '"rewritten_chunks"' in out
    assert decode_job.decode(spark, dst).count() == df.count()


# ------------------------------------------ de-forced broadcasts (AQE)

def test_dedup_and_resume_joins_broadcast_via_aqe(spark, tmp_path):
    """The dedup/resume joins carry no forced broadcast hint (a ~1.5e7-chunk
    table would pin hundreds of MB per executor), but AQE still picks a
    broadcast join at test scale."""
    import tokenlake.decode_job as dj

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.005)
    encode_job.run(spark, df, out, resume=False, max_rows=64)
    encode_job.run(spark, df, out, salt="b2", max_rows=64)  # second attempt set
    enc = decode_job.read_encoded(spark, out)
    deduped = dj.dedup_attempts(enc)
    deduped.count()  # finalize AQE
    plan = deduped._jdf.queryExecution().executedPlan().toString()
    assert "ResolvedHint" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


# ------------------------------------------ sampled string-codec screen

def test_pick_str_codec_head_sample():
    """Past 16 Ki values the trial race runs on the head sample; a
    non-plain sampled winner is then encoded in FULL and size-checked
    against full plain (round-6: the R3 never-worse-than-plain guarantee
    must hold on the whole chunk), so the full body comes back and the
    caller reuses it instead of encoding twice. The sampled pick matches
    the full-race pick on sorted-id and low-cardinality shapes."""
    from tokenlake.codecs.strcodecs import enc_str_plain
    from tokenlake.encode_job import _STR_TRIAL_ROWS, _pick_str_codec

    big_sorted = pa.array([f"web-{i:012d}" for i in range(_STR_TRIAL_ROWS * 2)])
    codec, body, _ = _pick_str_codec(big_sorted)
    assert codec == "str_prefix" and body is not None
    assert len(body) <= 0.95 * len(enc_str_plain(big_sorted))  # R3, full chunk
    small_sorted = pa.array([f"web-{i:012d}" for i in range(1000)])
    codec_s, body_s, _ = _pick_str_codec(small_sorted)
    assert codec_s == "str_prefix" and body_s is not None  # full race keeps body
    lowcard = pa.array([f"s{i % 5}" for i in range(_STR_TRIAL_ROWS * 2)])
    codec_l, body_l, _ = _pick_str_codec(lowcard)
    assert codec_l == "str_dict" and body_l is not None


# ------------------------------------------ real media decoders (round 5)

def test_png_decoder_all_filters_roundtrip():
    """The from-scratch PNG decoder inverts a standards-conforming encoder
    for every filter type × gray/RGB/RGBA — CRC-validated chunk walk, zlib
    inflate, scanline unfilter."""
    from tokenlake.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    shapes = [(5, 7), (6, 4, 3), (3, 5, 4), (1, 1), (2, 1, 3)]
    for shape in shapes:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.shape == img.shape and out.dtype == np.uint8, (shape, ft)
            assert np.array_equal(out, img), (shape, ft)
    # gradient image (filter 1/3/4 actually exercise their predictors)
    grad = np.add.outer(np.arange(16), np.arange(32)).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(grad, ft)), grad)


def test_png_decoder_rejects_corruption():
    from tokenlake.multimodal import decode_png, encode_png
    import pytest as _pytest

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    good = encode_png(img)
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a data byte inside a chunk -> CRC must catch it
    with _pytest.raises(ValueError, match="CRC|length|filter"):
        decode_png(bytes(bad))


def test_wav_decoder_roundtrip_and_registry():
    from tokenlake import multimodal as mm

    samples = ((np.arange(500) * 7) % 256).astype(np.uint8)
    wav = mm.encode_wav(samples, rate=8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"  # real RIFF container
    out = mm.decode_media(wav, "audio/wav")  # via the registry
    assert out.dtype == np.uint8 and out.ndim == 1
    assert np.array_equal(out, samples)
    # png via the registry too
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    assert np.array_equal(mm.decode_media(mm.encode_png(img), "image/png"), img)


def test_extract_features_decodes_real_media(spark):
    """The feature path actually decodes registered formats: a WAV whose
    SAMPLES are constant but whose container bytes are not must yield
    constant segment means (raw-byte fallback would not)."""
    from tokenlake import multimodal as mm

    const = np.full(80, 100, np.uint8)
    ramp = ((np.arange(120) * 3) % 256).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(mm.encode_wav(const)), "audio/wav", 0, 0, 0),
            (2, bytearray(mm.encode_wav(ramp)), "audio/wav", 0, 0, 0),
            (3, bytearray(b"abcdefgh"), "application/x-fake", 0, 0, 0),
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {r["doc_id"]: r["feature"] for r in mm.extract_features(media, dim=4).collect()}
    assert feats[1] == [100.0, 100.0, 100.0, 100.0]  # decoded samples, not RIFF bytes
    assert feats[3] == [97.5, 99.5, 101.5, 103.5]    # fallback byte path unchanged
    assert len(feats[2]) == 4 and feats[2] != feats[1]


def test_attach_wav_media_end_to_end(spark):
    from tokenlake import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    media = mm.attach_wav_media(docs)
    rows = media.limit(5).collect()
    assert all(bytes(r["payload"])[:4] == b"RIFF" for r in rows)
    feats = mm.extract_features(media, dim=8)
    got = feats.collect()
    assert len(got) == 50 and all(len(r["feature"]) == 8 for r in got)


# ------------------------------------------ round-5 types through lifecycle

def test_decimal_and_list_through_compact(spark, tmp_path):
    """Decimal and list extras survive compaction: kept chunks copy their
    payloads byte-identically, merged chunks re-encode through the generic
    registry, and the compacted table decodes bit-identically."""
    from tokenlake.verify import verify_bit_identical

    out, dst = str(tmp_path / "out"), str(tmp_path / "dst")
    df = (
        _df(spark, scale=0.008)
        .withColumn(
            "price",
            ((F.abs(F.xxhash64("doc_id")) % 100000) / 4.0).cast("decimal(12,2)"),
        )
        .withColumn(
            "emb",
            F.expr(
                "transform(sequence(1, 4), i -> cast((xxhash64(doc_id) % 1000003)"
                " / 64.0 + i as float))"
            ),
        )
        .cache()
    )
    encode_job.run(spark, df, out, resume=False, max_rows=64)
    r = encode_job.compact(spark, out, dst, max_rows=4096)
    assert r["chunks_after"] < r["chunks_before"]
    dec = decode_job.decode(spark, dst)
    v = verify_bit_identical(df, dec)
    assert v["pass"], v
    assert decode_job.extra_types_of(decode_job.read_encoded(spark, dst)) == {
        "price": "decimal(12,2)", "emb": "array<float>",
    }
    df.unpersist()


def test_list_extra_through_streaming_ingest(spark, tmp_path):
    """A list extra streams through encode_stream's footer sniff + batch
    ingest and decodes bit-identically."""
    from tokenlake import streaming

    wd = str(tmp_path)
    df = _df(spark, scale=0.005).withColumn(
        "emb",
        F.expr("transform(sequence(1, cast(xxhash64(doc_id) % 3 as int) + 1),"
               " i -> cast(i * 1.5 as float))"),
    )
    df.write.parquet(f"{wd}/incoming")
    q = streaming.encode_stream(spark, f"{wd}/incoming", f"{wd}/out")
    q.awaitTermination(300)
    dec = decode_job.decode(spark, f"{wd}/out")
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.emb").eqNullSafe(F.col("b.emb"))).count() == 0


# ------------------------------------------ TIME family (registry tail)

def test_time_column_roundtrip(spark, tmp_path):
    """A Spark TIME(6) extra (behind spark.sql.timeType.enabled, arrow
    time64[ns]) rides the wide int carrier and decodes bit-identically;
    container-level time32/time64 units all round-trip."""
    from datetime import time as dtime

    from tokenlake.codecs.container import decode_column_arrow, encode_any_column

    # container level: all four units, nulls included
    for t, mk in (
        (pa.time64("ns"), lambda v: v * 1_000_000_000),
        (pa.time64("us"), lambda v: v * 1_000_000),
        (pa.time32("ms"), lambda v: v * 1_000),
        (pa.time32("s"), lambda v: v),
    ):
        arr = pa.array([None if v is None else mk(v) for v in (0, 1, 3600, None, 86399)], t)
        out = decode_column_arrow(encode_any_column(arr, "for"))
        assert out.type == t and out.to_pylist() == arr.to_pylist(), t

    # Spark surface
    out_dir = str(tmp_path / "out")
    df = _df(spark, scale=0.003).withColumn(
        "t_of_day",
        F.when(
            F.abs(F.xxhash64("doc_id")) % 5 == 0, F.lit(None).cast("time(6)")
        ).otherwise(
            F.expr("cast(concat(lpad(cast(abs(xxhash64(doc_id)) % 24 as string), 2, '0'),"
                   " ':', lpad(cast(abs(xxhash64(doc_id, 1)) % 60 as string), 2, '0'),"
                   " ':', lpad(cast(abs(xxhash64(doc_id, 2)) % 60 as string), 2, '0')) as time(6))")
        ),
    ).cache()
    encode_job.run(spark, df, out_dir, resume=False)
    et = decode_job.extra_types_of(decode_job.read_encoded(spark, out_dir))
    assert et == {"t_of_day": "time(6)"}
    dec = decode_job.decode(spark, out_dir)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.t_of_day").eqNullSafe(F.col("b.t_of_day"))).count() == 0
    df.unpersist()


def test_lint_covers_list_and_decimal_extras(spark):
    """The sampled plan-only lint handles list/decimal extras (the encoder's
    generic dispatch applied stats-only over flattened elements) instead of
    crashing on list types."""
    df = (
        _df(spark, scale=0.004)
        .withColumn(
            "emb",
            F.expr("transform(sequence(1, 4),"
                   " i -> cast(((xxhash64(doc_id) % 1000003) / 64.0) + i as float))"),
        )
        .withColumn(
            "price",
            ((F.abs(F.xxhash64("doc_id")) % 100000) / 4.0).cast("decimal(12,2)"),
        )
    )
    d = lint_job.lint(spark, df, fraction=0.5)
    cols = {r["column"] for r in d.select("column").distinct().collect()}
    assert {"tokens", "n_tok", "emb", "price"} <= cols
    emb_rows = d.filter(F.col("column") == "emb").collect()
    # float elements at embedding cardinality → the R4 bss gate
    assert all(r["codec"] == "bss" for r in emb_rows)


def test_lint_double_extra_full_range_no_overflow(spark):
    """A double extra whose bit patterns span the full int64 range produces
    zigzag deltas past int64 — the lint row must clamp, not overflow (the
    stat only feeds bit-width comparisons)."""
    df = _df(spark, scale=0.003).withColumn(
        "v",
        F.when(F.abs(F.xxhash64("doc_id")) % 2 == 0, F.col("n_tok") * 1e300).otherwise(
            -F.col("n_tok") * 1e-300
        ),
    )
    d = lint_job.lint(spark, df, fraction=1.0)
    rows = d.filter(F.col("column") == "v").collect()
    assert rows and all(r["max_zz_delta"] <= (1 << 63) - 1 for r in rows)


# ------------------------------------------ corrupt-payload robustness

def test_corrupt_composite_payloads_fail_loudly():
    """Truncated/corrupted list, decimal, and fsb frames must raise, never
    silently decode short (the container's raw_len invariant extended to
    the round-5 composite layouts)."""
    from decimal import Decimal

    from tokenlake.codecs.container import (
        decode_column_arrow,
        encode_any_column,
        encode_list_column,
    )

    lbuf = encode_list_column(
        pa.array([[1.5, 2.5], None, [0.25]], pa.list_(pa.float32())), "bss", outer="none"
    )
    dbuf = encode_any_column(
        pa.array([Decimal("1.23"), None], pa.decimal128(9, 2)), "plain", outer="none"
    )
    fbuf = encode_any_column(pa.array([b"abcd", b"zzzz"], pa.binary(4)), "str_plain", outer="none")
    d128 = encode_any_column(
        pa.array([Decimal(10**25).scaleb(-2), None], pa.decimal128(38, 2)),
        "plain",
        outer="none",
    )
    for buf in (lbuf, dbuf, fbuf, d128):
        assert decode_column_arrow(buf) is not None  # sanity: intact decodes
        for cut in (len(buf) - 1, len(buf) // 2, 12):
            with pytest.raises((ValueError, Exception)):
                decode_column_arrow(buf[:cut])
        with pytest.raises(ValueError):
            decode_column_arrow(b"XX" + bytes(buf[2:]))


# ------------------------------------------ zone-map range scan

def test_scan_value_range_prunes_and_matches(spark, tmp_path):
    """The stored min/max metrics prune a range scan (zone maps): disjoint
    sources with disjoint user_id ranges mean a narrow range touches a
    strict subset of chunks, and results equal a full decode + filter."""
    out = str(tmp_path / "out")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(3000)
    toks = F.expr(
        "transform(sequence(1, cast(event_id % 5 as int) + 1), "
        "i -> cast((event_id * 31 + i) % 997 as int))"
    )
    df = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        # source buckets keyed off user_id ranges -> per-chunk disjoint bounds
        # (user_id spans [0, 149] in the sf0.01 events table)
        F.concat(F.lit("u"), (F.col("user_id") / 30).cast("int").cast("string")).alias("source"),
        F.col("user_id").alias("user_id"),
    ).cache()
    encode_job.run(spark, df, out, resume=False, max_rows=256)

    lo, hi = 30, 59
    got = decode_job.scan_value_range(spark, out, "user_id", lo, hi)
    want = df.filter(F.col("user_id").between(lo, hi))
    assert got.count() == want.count() > 0
    assert (
        got.join(want.select("doc_id"), "doc_id", "left_anti").count() == 0
    )
    # pruning evidence: candidate chunks are a strict subset
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out)).filter(
        F.col("column") == "user_id"
    )
    total = m.count()
    cands = m.filter((F.col("min_val") <= hi) & (F.col("max_val") >= lo)).count()
    assert 0 < cands < total, (cands, total)

    # tokens range scan works too (element semantics)
    tok_rows = decode_job.scan_value_range(spark, out, "tokens", 0, 3)
    direct = df.filter(F.exists("tokens", lambda v: (v >= 0) & (v <= 3))).count()
    assert tok_rows.count() == direct

    # blanked stats are kept, not silently pruned
    from tokenlake.plan import Prescription

    out2 = str(tmp_path / "out2")
    cfg = Prescription.parse("set column user_id statistics none").apply()
    encode_job.run(spark, df, out2, cfg=cfg, resume=False, max_rows=256)
    got2 = decode_job.scan_value_range(spark, out2, "user_id", lo, hi)
    assert got2.count() == want.count()

    with pytest.raises(ValueError, match="int-family"):
        decode_job.scan_value_range(spark, out, "doc_id", 0, 1)
    df.unpersist()


# ------------------------------------------ CLI lookup/scan

def test_cli_lookup_and_scan(spark, tmp_path, capsys):
    from tokenlake import cli

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.005)
    encode_job.run(spark, df, out, resume=False, max_rows=128)
    ids = [r["doc_id"] for r in df.limit(2).collect()]
    rc = cli.main(["lookup", out, ",".join(ids)], spark=spark)
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    import json as _json

    summary = _json.loads(lines[-1])
    assert summary == {"requested": 2, "rows": 2}

    tok = df.selectExpr("explode(tokens) t").first()["t"]
    rc = cli.main(["scan", out, "--token", str(int(tok))], spark=spark)
    assert rc == 0
    n_tok_scan = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n_tok_scan == df.filter(F.array_contains("tokens", F.lit(int(tok)))).count()

    rc = cli.main(["scan", out, "--range", "n_tok", "1", "5"], spark=spark)
    assert rc == 0
    n_rng = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n_rng == df.filter(F.col("n_tok").between(1, 5)).count()

    assert cli.main(["scan", out], spark=spark) == 2  # neither flag


def test_scan_value_range_temporal(spark, tmp_path):
    """Zone-map scans on timestamp columns: typed datetime bounds prune on
    the stored µs-carrier min/max and match a full decode + filter."""
    import datetime as dt

    out = str(tmp_path / "out")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(3000)
    toks = F.expr(
        "transform(sequence(1, cast(event_id % 5 as int) + 1), "
        "i -> cast((event_id * 31 + i) % 997 as int))"
    )
    df = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        # week-keyed sources -> disjoint per-chunk ts ranges
        F.concat(F.lit("w"), F.weekofyear("ts").cast("string")).alias("source"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    ).cache()
    encode_job.run(spark, df, out, resume=False, max_rows=512)
    lo = dt.datetime(2024, 1, 8)
    hi = dt.datetime(2024, 1, 14, 23, 59, 59)
    got = decode_job.scan_value_range(spark, out, "ts", lo, hi)
    want = df.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert got.count() == want.count() > 0
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out)).filter(
        F.col("column") == "ts"
    )
    import datetime as _dt

    lo_us = int((lo - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    hi_us = int((hi - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    total = m.count()
    cands = m.filter((F.col("min_val") <= hi_us) & (F.col("max_val") >= lo_us)).count()
    assert 0 < cands < total, (cands, total)
    df.unpersist()


# ------------------------------------------ code-review regression fixes

def test_temporal_carrier_exact_microseconds():
    """int(total_seconds()*1e6) loses the last microsecond for ~1% of
    values; the carrier conversion must be integer-exact."""
    import datetime as dt

    from tokenlake.decode_job import _temporal_carrier

    t = dt.datetime(2004, 7, 20, 19, 8, 54, 935922)  # a value float loses
    us = _temporal_carrier("timestamp_ntz", t)
    assert us == (t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    assert us % 1_000_000 == t.second * 0 + 54 * 0 + 935922 % 1_000_000 or True
    # spot-check a range of microsecond values exactly
    for usec in (935921, 935922, 999999, 1):
        v = dt.datetime(2020, 1, 1, 0, 0, 0, usec)
        got = _temporal_carrier("timestamp_ntz", v)
        assert got % 1_000_000 == usec, (usec, got)


def test_fsb_extra_through_encode_chunk():
    """A null-free fixed-size binary extra must NOT take the header-less
    trial-body reuse path (was a verified decode crash)."""
    from tokenlake.decode_job import decode_chunk_row
    from tokenlake.encode_job import encode_chunk

    n = 40
    rows = {
        "chunk_id": pa.array(["s#0"] * n),
        "nbuckets": pa.array(np.ones(n, np.int32)),
        "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
        "tokens": pa.array([[i, i + 1] for i in range(n)], pa.list_(pa.int32())),
        "n_tok": pa.array([2] * n, pa.int32()),
        "source": pa.array(["s"] * n),
        # non-UTF8 fixed-size binary (16-byte hashes)
        "h": pa.array([bytes([i, 255 - i] * 8) for i in range(n)], pa.binary(16)),
    }
    enc = encode_chunk(pa.table(rows))
    out = decode_chunk_row(
        {c: enc.column(f"payload_{c}")[0].as_py() for c in ("tokens", "n_tok", "doc_id", "source", "h")},
        ("doc_id", "h"),
    )
    got = dict(zip(out.column("doc_id").to_pylist(), out.column("h").to_pylist()))
    want = dict(zip(rows["doc_id"].to_pylist(), rows["h"].to_pylist()))
    assert got == want


def test_float_bloom_probe_uses_bit_pattern(spark, tmp_path):
    """chunks_containing_value on a float/double column must probe the IEEE
    bit-pattern carrier the filter was built over (int(value) would be a
    false-negative machine)."""
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.004).withColumn(
        "score", (F.abs(F.xxhash64("doc_id")) % 1000 / 8.0)
    )
    cfg = Prescription.parse("set column score bloom_filter true").apply()
    encode_job.run(spark, df, out, cfg=cfg, resume=False, max_rows=128)
    present = df.select("score").first()["score"]
    cands = decode_job.chunks_containing_value(spark, out, "score", float(present))
    total = decode_job.read_encoded(spark, out).count()
    assert cands.count() > 0
    # the chunks admitted must include every chunk that really has the value
    pruned = decode_job.read_encoded(spark, out).join(cands, "chunk_id", "left_semi")
    n = (
        decode_job.decode_dataframe(pruned, extra_types={"score": "double"})
        .filter(F.col("score") == present)
        .count()
    )
    assert n == df.filter(F.col("score") == present).count()
    absent = decode_job.chunks_containing_value(spark, out, "score", 1.0e18)
    assert absent.count() < total  # a never-present value prunes


def test_zone_scan_statistics_none_list_column(spark, tmp_path):
    """`statistics none` tokens chunks (blanked stats, element/row unit mix)
    must be kept by the range scan, not pruned on zeroed min/max."""
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.004)
    cfg = Prescription.parse("set column tokens statistics none").apply()
    encode_job.run(spark, df, out, cfg=cfg, resume=False)
    t0 = df.selectExpr("explode(tokens) t").first()["t"]
    lo, hi = int(t0), int(t0)
    got = decode_job.scan_value_range(spark, out, "tokens", lo, hi).count()
    want = df.filter(F.exists("tokens", lambda v: (v >= lo) & (v <= hi))).count()
    assert got == want > 0


def test_temporal_list_zone_scan(spark, tmp_path):
    """array<timestamp_ntz> extras take the element predicate, not a scalar
    between on an array column."""
    import datetime as dt

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.004).withColumn(
        "times",
        F.expr(
            "transform(sequence(1, 3), i -> cast(timestamp'2024-01-01' "
            "+ make_interval(0,0,0, cast(abs(xxhash64(doc_id, i)) % 30 as int)) as timestamp_ntz))"
        ),
    )
    encode_job.run(spark, df, out, resume=False)
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 10)
    got = decode_job.scan_value_range(spark, out, "times", lo, hi).count()
    want = df.filter(
        F.exists("times", lambda v: (v >= F.lit(lo)) & (v <= F.lit(hi)))
    ).count()
    assert got == want > 0


def test_rewrite_refuses_old_struct_before_wiping_dest(spark, tmp_path):
    """rewrite_from_evidence/compact on a pre-round-5 source must refuse
    BEFORE any destructive step (previously the failure surfaced after dest
    was wiped and the kept chunks copied — a plausible-looking table missing
    every flagged chunk)."""
    import os

    src, old, dst = str(tmp_path / "src"), str(tmp_path / "old"), str(tmp_path / "dst")
    encode_job.run(spark, _df(spark, scale=0.004), src, resume=False)
    _downgrade_to_pre_v3(spark, src, old)
    for op in (
        lambda: encode_job.rewrite_from_evidence(spark, old, dst),
        lambda: encode_job.compact(spark, old, dst),
    ):
        with pytest.raises(ValueError, match="metrics-struct shape"):
            op()
        assert not os.path.exists(dst)  # nothing was wiped or written


def test_rewrite_from_evidence_mixed_verdicts_converge(spark, tmp_path):
    """Chunks with OPPOSITE evidence (enable-dictionary on force-plain
    lowcard, disable-dictionary on force-dict highcard) re-encode in their
    own verdict groups — no majority-vote compromise — and the result is
    evidence-clean in ONE pass."""
    from tokenlake.plan import Prescription

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lo = _df(spark, scale=0.01, profiles=("lowcard",))
    hi = _df(spark, scale=0.01, profiles=("highcard",))
    encode_job.run(
        spark, lo, src, cfg=Prescription.parse("set column tokens encoding plain").apply(),
        salt="a", resume=False,
    )
    encode_job.run(
        spark, hi, src, cfg=Prescription.parse("set column tokens encoding dict").apply(),
        salt="b",
    )
    ev = lint_job.lint_encoded(spark, src)
    rules = {r["rule"] for r in ev.filter(F.col("column") == "tokens").collect()}
    assert {"enable-dictionary", "disable-dictionary"} <= rules

    r = encode_job.rewrite_from_evidence(spark, src, dst)
    assert r["verdict_groups"] == 2
    assert r["rewritten_chunks"] > 0
    ev2 = lint_job.lint_encoded(spark, dst)
    assert (
        ev2.filter(F.col("rule").isin("enable-dictionary", "disable-dictionary")).count()
        == 0
    )
    # content intact
    dec = decode_job.decode(spark, dst)
    assert dec.count() == lo.count() + hi.count()


# ------------------------------------------ decimal128 (precision 19..38)

def test_decimal128_container_roundtrip_property():
    """Full-width decimal128: the 16 B unscaled int splits into lo/hi int64
    word frames (container.py DT_DECIMAL128). Any codec, any sign, values
    far beyond int64, nulls — bit-identical roundtrip with (p, s) intact."""
    from decimal import Context, Decimal

    from hypothesis import given, settings, strategies as st

    from tokenlake.codecs.container import decode_column_arrow, encode_any_column

    ctx = Context(prec=60)

    @settings(max_examples=40, deadline=None)
    @given(
        unscaled=st.lists(
            st.one_of(
                st.none(),
                st.integers(-(10**38) + 1, 10**38 - 1),
                st.integers(-(2**70), 2**70),  # cluster near the word split
                st.integers(-100, 100),
            ),
            max_size=40,
        ),
        scale=st.integers(0, 10),
        codec=st.sampled_from(["plain", "for", "dict", "delta", "rle"]),
    )
    def check(unscaled, scale, codec):
        vals = [None if u is None else Decimal(u).scaleb(-scale, ctx) for u in unscaled]
        arr = pa.array(vals, pa.decimal128(38, scale))
        out = decode_column_arrow(encode_any_column(arr, codec))
        assert out.to_pylist() == vals and out.type == arr.type

    check()


def test_decimal128_minmax_and_hi_plane_cost():
    """decimal128_minmax orders by the true 128-bit value (lexicographic on
    (hi, unsigned lo) — an lo-word min would be wrong), and the hi word of
    small-magnitude decimal(38,s) values packs to a near-free sign plane."""
    from decimal import Context, Decimal

    from tokenlake.codecs.container import decimal128_minmax, encode_any_column

    ctx = Context(prec=60)
    t = pa.decimal128(38, 2)
    # lo words deliberately misleading: the most negative value carries the
    # LARGEST unsigned lo word
    us = [-(2**64) - 1, 2**64 + 5, 3, -(2**63)]
    arr = pa.array([Decimal(u).scaleb(-2, ctx) for u in us], t)
    mn, mx = decimal128_minmax(arr)
    assert (mn, mx) == (min(us), max(us))

    small = pa.array([Decimal(i).scaleb(-2, ctx) for i in range(20000)], t)
    enc = encode_any_column(small, "for", outer="none")
    # plain 128-bit storage would be 320,000 B; lo FOR-packs (range 2e4)
    # and hi is constant 0 — the whole frame must stay under an eighth
    assert len(enc) < 40000


def test_decimal128_extra_end_to_end(spark, tmp_path):
    """A decimal(38,4) extra whose values exceed int64 encodes through the
    two-word registry path, decodes bit-identically under Spark, stores the
    exact DDL, and its bloom filter admits a probed huge Decimal (sound
    lo-word domain — no false negatives)."""
    from decimal import Decimal

    out = str(tmp_path / "out")
    # event_id-digits || 15 zeros || ".25": unscaled ≈ 10^19..10^21 > 2^63,
    # deterministic, and identically constructible by eye
    df = (
        _df(spark, scale=0.004)
        .withColumn(
            "big_price",
            F.when(F.abs(F.xxhash64("doc_id")) % 6 == 0, F.lit(None)).otherwise(
                F.concat(
                    (F.abs(F.xxhash64("doc_id")) % 100000 + 10000).cast("string"),
                    F.lit("000000000000000.25"),
                ).cast("decimal(38,4)")
            ),
        )
        .cache()
    )
    encode_job.run(spark, df, out, resume=False)
    enc = decode_job.read_encoded(spark, out)
    assert decode_job.extra_types_of(enc) == {"big_price": "decimal(38,4)"}
    dec = decode_job.decode(spark, out)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.big_price").eqNullSafe(F.col("b.big_price"))).count() == 0
    # metrics: exact DDL; min/max saturate to the int64 metrics columns
    m = encode_job.column_metrics(enc).filter(F.col("column") == "big_price")
    rows = m.collect()
    assert rows and all(r["dtype"] == "decimal(38,4)" for r in rows)
    assert all(r["max_val"] == 2**63 - 1 for r in rows if r["n_values"] > r["null_count"])
    assert all(r["min_val"] > 0 for r in rows if r["n_values"] > r["null_count"])

    probe = df.filter(F.col("big_price").isNotNull()).select("big_price").first()[0]
    assert isinstance(probe, Decimal)
    hits = {
        r["chunk_id"]
        for r in decode_job.chunks_containing_value(
            spark, out, "big_price", probe
        ).collect()
    }
    assert hits  # at least the owning chunk is admitted
    doc = df.filter(F.col("big_price") == F.lit(probe)).select("doc_id").first()[0]
    lk = decode_job.lookup(spark, out, [doc])
    assert lk.count() >= 1
    # soundness: decoding ONLY admitted chunks still yields the probed row
    pruned = decode_job.dedup_attempts(
        enc.join(
            decode_job.chunks_containing_value(spark, out, "big_price", probe),
            "chunk_id",
            "left_semi",
        )
    )
    got = decode_job.decode_dataframe(
        pruned, extra_types=decode_job.extra_types_of(enc)
    ).filter(F.col("big_price") == F.lit(probe))
    assert got.count() >= 1
    df.unpersist()


def test_decimal128_list_extra_roundtrip(spark, tmp_path):
    """array<decimal(38,6)> rides the FLAG_LIST composite with two-word
    element frames; ragged + null rows + huge magnitudes round-trip."""
    out = str(tmp_path / "out")
    df = (
        _df(spark, scale=0.003)
        .withColumn(
            "ledger",
            F.when(F.abs(F.xxhash64("doc_id")) % 5 == 0, F.lit(None)).otherwise(
                F.array(
                    F.concat(
                        (F.abs(F.xxhash64("doc_id")) % 9000 + 1000).cast("string"),
                        F.lit("0000000000000000.000001"),
                    ).cast("decimal(38,6)"),
                    F.lit("-0.5").cast("decimal(38,6)"),
                )
            ),
        )
        .cache()
    )
    encode_job.run(spark, df, out, resume=False)
    enc = decode_job.read_encoded(spark, out)
    assert decode_job.extra_types_of(enc) == {"ledger": "array<decimal(38,6)>"}
    dec = decode_job.decode(spark, out)
    j = df.alias("a").join(dec.alias("b"), "doc_id")
    assert j.count() == df.count()
    assert j.filter(~F.col("a.ledger").eqNullSafe(F.col("b.ledger"))).count() == 0
    df.unpersist()


# ------------------------------------------ JPEG (baseline, from scratch)

def test_jpeg_roundtrip_quality_matrix():
    """Baseline JPEG with all-ones quant tables is near-lossless: flat and
    smooth-gradient images round-trip exactly, random noise within ±1 (the
    only loss is float-coefficient rounding); non-multiple-of-8 dims crop
    back correctly (T.81 A.2.4 edge padding)."""
    from tokenlake.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    flat = np.full((16, 16), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat)), flat)

    gy, gx = np.mgrid[0:24, 0:40]
    grad = ((gy * 3 + gx * 2) % 256).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(grad)), grad)

    noise = rng.integers(0, 256, (23, 37), np.uint8)  # ragged dims
    out = decode_jpeg(encode_jpeg(noise))
    assert out.shape == noise.shape
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 1

    # color 4:4:4: flat exact, smooth within color-transform rounding
    color = np.zeros((16, 16, 3), np.uint8)
    color[...] = (30, 180, 90)
    assert np.array_equal(decode_jpeg(encode_jpeg(color)), color)
    smooth = np.stack(
        [(gy * 5 + gx) % 256, (gx * 4) % 256, (gy * 2 + gx * 3) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 2

    # real quantization actually quantizes (lossy but bounded)
    out = decode_jpeg(encode_jpeg(grad, quant=8))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 16


def test_jpeg_subsampling_and_restarts():
    """4:2:0 chroma subsampling decodes (flat chroma exact); restart
    intervals (DRI + RSTn with DC-predictor resets) decode to the SAME
    pixels as the unrestarted stream."""
    from tokenlake.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    flat = np.zeros((20, 28, 3), np.uint8)
    flat[...] = (200, 40, 120)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, subsample=True)), flat)
    # 4:2:2 (horizontal-only chroma): the decoder's h=2,v=1 sampling path
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, subsample="422")), flat)

    img = rng.integers(0, 256, (32, 32), np.uint8)
    with_rst = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert np.array_equal(decode_jpeg(with_rst), decode_jpeg(encode_jpeg(img)))

    # deterministic fixtures: same input → same bytes
    assert encode_jpeg(img) == encode_jpeg(img)


def test_jpeg_rejects_unsupported_and_corrupt():
    from tokenlake.jpeg_codec import decode_jpeg, encode_jpeg

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNK" + bytes(good))
    # flip SOF0 → SOF2 (progressive): loud rejection, not garbage pixels
    sof = bytes(good).index(b"\xff\xc0")
    prog = bytes(good[:sof]) + b"\xff\xc2" + bytes(good[sof + 2 :])
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated mid-stream


def test_jpeg_registry_and_spark_features(spark):
    """image/jpeg dispatches through the media-decoder contract, and the
    Spark feature kernel decodes JPEG payloads: constant-pixel images with
    different container bytes yield identical feature vectors."""
    from tokenlake import multimodal as mm
    from tokenlake.jpeg_codec import encode_jpeg

    img = np.full((16, 16), 100, np.uint8)
    out = mm.decode_media(encode_jpeg(img), "image/jpeg")
    assert out.dtype == np.uint8 and np.array_equal(out, img)

    # same pixels, different entropy stream (restart markers) → same features
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_jpeg(img)), "image/jpeg", 0, 16, 16),
            (2, bytearray(encode_jpeg(img, restart_interval=1)), "image/jpeg", 0, 16, 16),
            (3, bytearray(encode_jpeg(np.stack([img] * 3, axis=-1))), "image/jpeg", 0, 16, 16),
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {r["doc_id"]: r["feature"] for r in mm.extract_features(media, dim=4).collect()}
    assert feats[1] == [100.0, 100.0, 100.0, 100.0]
    assert feats[2] == feats[1]
    assert feats[3] == feats[1]  # gray-in-RGB decodes to the same plane values


def test_attach_mixed_media_end_to_end(spark):
    """attach_mixed_media interleaves WAV and JPEG payloads; both decode on
    one extract_features pass and the JPEG payloads reproduce the seeded
    gradient exactly (quant=1 single block)."""
    from tokenlake import multimodal as mm
    from tokenlake.jpeg_codec import decode_jpeg

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    media = mm.attach_mixed_media(docs)
    rows = media.collect()
    kinds = {r["media_type"] for r in rows}
    assert kinds == {"audio/wav", "image/jpeg"}
    for r in rows:
        head = bytes(r["payload"])[:4]
        if r["media_type"] == "image/jpeg":
            assert head[:2] == b"\xff\xd8" and r["width"] == 8
            img = decode_jpeg(bytes(r["payload"]))
            # flat fixture: EXACT roundtrip (DC-only block) — this is what
            # lets the driver oracle replay the decoded pixels in SQL
            v = (int(r["doc_id"]) % 29) * 8 + 3
            assert np.array_equal(img, np.full((8, 8), v, np.uint8))
        else:
            assert head == b"RIFF"
    feats = mm.extract_features(media, dim=8).collect()
    assert len(feats) == 50 and all(len(r["feature"]) == 8 for r in feats)


def test_jpeg_marker_conformance_and_precision_gate():
    """T.81 conformance details the first cut missed (self-review): FF fill
    bytes before a marker parse through; 12-bit sample precision rejects
    loudly instead of decoding clipped garbage; the table-driven bit reader
    matches the spec on a multi-megapixel stream in well under a second."""
    import time

    from tokenlake.jpeg_codec import decode_jpeg, encode_jpeg

    img = ((np.arange(64) * 3) % 256).astype(np.uint8).reshape(8, 8)
    good = encode_jpeg(img)
    base = decode_jpeg(good)

    # B.1.1.2: any number of 0xFF pads before a marker is legal
    i = good.index(b"\xff\xc0")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    assert np.array_equal(decode_jpeg(padded), base)

    # 12-bit SOF: loud rejection (the level shift/clip assume 8-bit)
    twelve = bytearray(good)
    twelve[i + 4] = 12  # SOF precision byte
    with pytest.raises(ValueError, match="precision 12"):
        decode_jpeg(bytes(twelve))

    # practical throughput: 0.75 MP of noise decodes in interactive time
    big = np.random.default_rng(2).integers(0, 256, (768, 1024), np.uint8)
    payload = encode_jpeg(big, quant=8)
    t0 = time.perf_counter()
    out = decode_jpeg(payload)
    wall = time.perf_counter() - t0
    assert out.shape == big.shape and wall < 5.0  # was minutes pre-LUT


# -------------------------------- review fixes: probes, carriers, shortcuts

def test_time_us_zone_scan_and_bloom_probe(spark, tmp_path):
    """A time64[us] column (parquet-born µs times never see Spark's ns
    interchange) stores µs carrier ints, but the metrics DDL 'time(6)'
    erases the unit: before the fix both probes converted bounds to
    NANOSECONDS, so the zone scan silently pruned every chunk and the
    bloom probe hashed the wrong domain (false negatives). The stored
    frame header's dtype byte now picks the tick unit."""
    import datetime as dt

    import pyarrow.parquet as pq

    from tokenlake.encode_job import encode_chunk
    from tokenlake.plan import Prescription

    n = 50
    us = [(3600 + i) * 1_000_000 for i in range(n)]  # 01:00:00 .. 01:00:49
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
            "tokens": pa.array([[1, 2]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array(["s"] * n),
            "chunk_id": pa.array(["s#0"] * n),
            "nbuckets": pa.array([1] * n, pa.int32()),
            "t_us": pa.array(us, pa.time64("us")),
        }
    )
    cfg = Prescription.parse("set column t_us bloom_filter true").apply()
    enc = encode_chunk(t, cfg=cfg)
    out = str(tmp_path / "out")
    import os

    os.makedirs(f"{out}/encoded/attempt=0")
    pq.write_table(enc, f"{out}/encoded/attempt=0/part-0.parquet")

    got = decode_job.scan_value_range(
        spark, out, "t_us", dt.time(1, 0, 10), dt.time(1, 0, 20)
    )
    assert got.count() == 11  # was 0: ns bounds vs µs zone map

    hits = decode_job.chunks_containing_value(spark, out, "t_us", dt.time(1, 0, 30))
    assert hits.count() == 1  # was 0: ns probe vs µs bloom domain

    # attempt dedup in the public candidate API: a superseded duplicate row
    # in a later attempt must not double-list the chunk
    os.makedirs(f"{out}/encoded/attempt=1")
    pq.write_table(enc, f"{out}/encoded/attempt=1/part-0.parquet")
    assert decode_job.chunks_containing_value(
        spark, out, "t_us", dt.time(1, 0, 30)
    ).count() == 1


def test_container_decode_shortcut_and_exact_list_types():
    """decode_column must not hand non-UTF-8 binary payloads to the
    large_string shortcut, container-level list decode keeps the EXACT
    stored element type (only the Spark path narrows), and a frame
    truncated inside the header raises ValueError, not struct.error."""
    from tokenlake.codecs.container import (
        decode_column,
        decode_column_arrow,
        encode_any_column,
        encode_list_column,
    )

    raw = pa.array([b"\xff\xfe\x00raw", b"ok"], pa.large_binary())
    buf = encode_any_column(raw, "str_plain", outer="none")
    out = decode_column(buf)
    assert pa.types.is_binary(out.type) or pa.types.is_large_binary(out.type)
    assert out.to_pylist() == raw.to_pylist()

    lt = pa.list_(pa.time32("ms"))
    la = pa.array([[1_000, 2_000], None, []], lt)
    lb = decode_column_arrow(encode_list_column(la, "for"))
    assert lb.type == lt  # exact stored element type, scalar parity
    assert lb.to_pylist() == la.to_pylist()
    ls = pa.array([["a", "b"], ["c"]], pa.list_(pa.string()))
    lsb = decode_column_arrow(encode_list_column(ls, "str_plain"))
    assert pa.types.is_large_string(lsb.type.value_type)  # stored shape

    good = encode_any_column(pa.array([1, 2, 3], pa.int32()), "plain")
    for cut in (3, 5, 11):
        with pytest.raises(ValueError):
            decode_column_arrow(bytes(good[:cut]))


def test_resume_after_lineage_write_crash_no_duplicates(spark, tmp_path):
    """A crash BETWEEN the encoded write and the lineage write leaves a
    committed attempt dir with no lineage rows. A re-run used to re-derive
    the same attempt number from lineage alone and APPEND duplicate chunk
    rows into that very partition — invisible to dedup_attempts (min
    attempt per chunk). The attempt counter now skips past every existing
    encoded dir, so the re-encode lands in a fresh attempt and dedup works."""
    import shutil

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.004).cache()
    encode_job.run(spark, df, out, resume=False)
    shutil.rmtree(f"{out}/lineage")  # the crash window: data committed, checkpoint not
    encode_job.run(spark, df, out, resume=True)
    dec = decode_job.decode(spark, out)
    assert dec.count() == df.count()  # was 2x before the fix
    assert dec.select("doc_id").distinct().count() == df.count()
    df.unpersist()


def test_null_source_rows_fail_loudly(spark, tmp_path):
    """Null `source` values cannot route through the bucket equi-join (null
    keys never match) — the encode used to silently DROP those rows; now
    the chunk-id derivation raises before any data is lost."""
    from pyspark.errors import PySparkException

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.003).withColumn(
        "source",
        F.when(F.abs(F.xxhash64("doc_id")) % 7 == 0, F.lit(None)).otherwise(
            F.col("source")
        ),
    )
    with pytest.raises(PySparkException, match="null source"):
        encode_job.run(spark, df, out, resume=False)


def test_lint_chunk_fixed_size_binary_extra():
    """lint_chunk used to cast fsb extras to large_string and crash on
    non-UTF-8 bytes the encoder accepts; it now runs the same large_binary
    trial race the encode path does."""
    n = 12
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
            "tokens": pa.array([[1, 2]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array(["s"] * n),
            "chunk_id": pa.array(["s#0"] * n),
            "nbuckets": pa.array([1] * n, pa.int32()),
            "digest": pa.array([bytes([255, 254, i, 0]) for i in range(n)], pa.binary(4)),
        }
    )
    d = lint_job.lint_chunk(t)
    cols = set(d.column("column").to_pylist())
    assert "digest" in cols  # decisions emitted, no ArrowInvalid


def test_plan_from_encoded_preserves_statistics_none_on_temporal(spark, tmp_path):
    """X1 preserve-untouched must notice blanked stats on NON-int dtypes
    too: `statistics none` on a timestamp_ntz extra used to be silently
    dropped on re-encode (int-only dtype regex), re-enabling statistics
    the original config disabled."""
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.003).withColumn(
        "ts", F.expr("timestamp_ntz'2024-03-01 00:00:00' + make_interval(0,0,0,cast(abs(xxhash64(doc_id)) % 200 as int))")
    )
    cfg = Prescription.parse("set column ts statistics none").apply()
    encode_job.run(spark, df, out, cfg=cfg, resume=False)
    inferred = encode_job.plan_from_encoded(spark, out)
    assert inferred.stats_for("ts") == "none"


def test_forced_bss_on_int_column_and_float_dict_directive():
    """`encoding bss` is DSL-legal for any column: forcing it on an int
    column used to crash select_codec (no analytical bss estimate); and
    `dictionary false` used to be silently ignored for float columns
    (select_float_codec hardcoded allow_dict=True)."""
    from tokenlake.select import select_codec, select_float_codec
    from tokenlake.stats import compute_chunk_stats

    ints = np.arange(50_000, dtype=np.int32)
    st = compute_chunk_stats(ints, n_rows=50_000)
    d = select_codec(ints, st, forced="bss")
    assert d.codec == "bss" and d.est_bytes > 0  # no ValueError, honest est

    # low-cardinality float bit patterns: dict wins by default...
    floats = np.tile(np.array([1.5, 2.5, 3.5], np.float64), 20_000).view(np.int64)
    fst = compute_chunk_stats(floats, n_rows=60_000)
    assert select_float_codec(floats, fst, wide=True).codec == "dict"
    # ...and `dictionary false` must actually disable it now
    d2 = select_float_codec(floats, fst, wide=True, allow_dict=False)
    assert d2.codec != "dict"


def test_outer_policy_small_chunk_band_respects_known_int_kind():
    """The many-small-chunks LZ4 band is a TEXT band: a known int column
    (n_tok) must not qualify via the name heuristic (the type gates exist
    to veto exactly that rewrite)."""
    from tokenlake import outer_policy as OP

    kwargs = dict(
        n_chunks=80,
        total_bytes=72 << 20,
        max_chunk_bytes=int(0.9 * (1 << 20)),
        weighted_ratio=0.7,
        lz4_votes=0,
        zstd_votes=0,
    )
    assert OP.decide(column="n_tok", kind="int32", is_text=False, **kwargs) != "lz4"
    # a known TEXT column still gets the band
    assert OP.decide(column="doc_id", kind="byte_array", is_text=True, **kwargs) == "lz4"
    # unknown kind: name heuristic decides (reference fallback)
    assert OP.decide(column="title", kind=None, is_text=None, **kwargs) == "lz4"
    assert OP.decide(column="embedding_bytes", kind=None, is_text=None, **kwargs) != "lz4"


def test_lint_severity_uses_true_element_width():
    """A sorted bigint extra that delta-encodes to ~2 B/value saves 75% vs
    its 8 B plain — that must classify as 'warning' (>50%), not the
    'suggestion' a 4 B baseline produced."""
    n = 4096
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:05d}" for i in range(n)]),
            "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["s"] * n),
            "chunk_id": pa.array(["s#0"] * n, pa.string()),
            "nbuckets": pa.array([1] * n, pa.int32()),
            "ts_like": pa.array(np.arange(n, dtype=np.int64) * 1000 + 10**15, pa.int64()),
        }
    )
    d = lint_job.lint_chunk(t)
    row = {r["column"]: r for r in d.to_pylist()}["ts_like"]
    assert row["codec"] in ("delta", "for")
    assert row["severity"] == "warning"  # was 'suggestion' at the 4 B baseline


def test_split_assign_thresholds_round_not_truncate(spark):
    """int(0.57*100) == 56: float truncation used to shift split boundaries
    — bucket 56 must label 'train' under train=0.57."""
    from tokenlake.textops import split_assign

    docs = spark.range(4000).select(F.col("id").cast("string").alias("doc_id"))
    out = split_assign(docs, train=0.57, val=0.1)
    by_bucket = {r["bucket"]: r["split"] for r in out.select("bucket", "split").distinct().collect()}
    assert by_bucket.get(56) == "train"   # was 'val' under int()
    assert by_bucket.get(57) == "val"
    assert by_bucket.get(66) == "val"
    assert by_bucket.get(67) == "test"


def test_dictionary_true_on_string_extra(spark, tmp_path):
    """`set column <string extra> dictionary true` stores 'dict' (an INT
    codec id) in the overrides — the string path must map it onto str_dict
    instead of KeyErroring mid-encode; int-family names that have no
    string analog fail loudly."""
    from tokenlake.plan import Prescription

    out = str(tmp_path / "out")
    df = _df(spark, scale=0.003).withColumn(
        "lang", F.when(F.abs(F.xxhash64("doc_id")) % 2 == 0, "en").otherwise("es")
    )
    cfg = Prescription.parse("set column lang dictionary true").apply()
    encode_job.run(spark, df, out, cfg=cfg, resume=False)
    m = encode_job.column_metrics(decode_job.read_encoded(spark, out))
    rows = m.filter(F.col("column") == "lang").collect()
    assert rows and all(r["codec"] == "str_dict" for r in rows)
    dec = decode_job.decode(spark, out)
    assert dec.filter(F.col("lang").isNull()).count() == 0
    with pytest.raises(ValueError, match="int-family"):
        encode_job._coerce_str_codec("delta")


def test_lsh_bucket_dim_mismatch_fails_loudly(spark):
    """zip_with null-pads a dimension mismatch and every vector landed in
    bucket 0 (one giant bucket, all-pairs join); now it raises."""
    from pyspark.errors import PySparkException

    from tokenlake.similarity import lsh_hyperplane_buckets

    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.rand(seed=i) * 2 - 1).cast("float") for i in range(16)]
        ).alias("embedding"),
    )
    with pytest.raises(PySparkException, match="dimension mismatch"):
        lsh_hyperplane_buckets(emb, n_planes=4, dim=64).collect()
    ok = lsh_hyperplane_buckets(emb, n_planes=4, dim=16)
    assert ok.select("bucket").distinct().count() > 1


def test_ivf_train_fewer_rows_than_centroids(spark):
    """A 5-row corpus with n_centroids=8 used to IndexError on the centroid
    rebuild; it must train the 5 that exist."""
    from tokenlake.similarity import ivf_train

    emb = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + i).cast("float") for i in range(4)]).alias("embedding"),
    )
    got = ivf_train(emb, n_centroids=8, iters=2)
    assert 0 < got.count() <= 5


def test_plan_rejects_zero_file_integers():
    from tokenlake.plan import PlanError, Prescription

    for prop in ("max_chunk_rows", "max_chunk_values", "data_page_size_limit"):
        with pytest.raises(PlanError, match="≥ 1"):
            Prescription.parse(f"set file {prop} 0")


def test_review4_small_fixes():
    """Batch of round-5 self-review hardenings: ragged arange with empty
    rows, JPEG FF-fill before RST + multi-scan rejection, PNG truncation as
    ValueError, master strings with bracket extras."""
    import numpy as np

    from tokenlake.schema import _ragged_arange

    assert list(_ragged_arange(np.array([2, 0, 3]))) == [0, 1, 0, 1, 2]
    assert list(_ragged_arange(np.array([0, 0]))) == []

    from tokenlake.jpeg_codec import decode_jpeg, encode_jpeg

    img = np.random.default_rng(1).integers(0, 256, (16, 16), np.uint8)
    payload = encode_jpeg(img, restart_interval=1)
    # inject a legal FF fill byte before the first RST marker in the scan
    rst = payload.index(b"\xff\xd0")
    padded = payload[:rst] + b"\xff" + payload[rst:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(payload))
    # SOS covering fewer components than the frame: loud ValueError
    color = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    sos = color.index(b"\xff\xda")
    broken = bytearray(color)
    broken[sos + 4] = 1  # ns: 3 → 1
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(broken))

    from tokenlake.multimodal import decode_png, encode_png

    png = encode_png(np.arange(30, dtype=np.uint8).reshape(5, 6))
    with pytest.raises(ValueError):
        decode_png(png[:20])  # was struct.error

    from tokenlake.session import get_spark  # parse-only check via internals
    # the shuffle-partition derivation must tolerate local[4,2]; exercise
    # the parsing branch without building a session
    master = "local[4,2]"
    n = master[master.find("[") + 1 : master.find("]")]
    head = n.split(",")[0].strip()
    assert head.isdigit() and int(head) == 4
