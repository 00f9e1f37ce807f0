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

from .codecs import decode_column, decode_column_arrow

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


def _payloads_for(columns: tuple[str, ...], extra: dict[str, str] | None = None) -> list[str]:
    unknown = [
        c for c in columns if c not in _COLUMN_PAYLOADS and c not in (extra or {})
    ]
    if unknown:
        raise ValueError(
            f"unknown decode columns {unknown}; valid: {list(ALL_COLUMNS)}"
            + (f" + extras {sorted(extra)}" if extra else "")
        )
    need: list[str] = []
    for c in columns:
        for p in _COLUMN_PAYLOADS.get(c, (c,)):
            if p not in need:
                need.append(p)
    return need


def _ntok_parts(buf: bytes):
    """n_tok payload → (lens_for_offsets int64 with 0 at null rows,
    n_tok arrow array, row validity bool array or None)."""
    vals = decode_column(buf)
    if isinstance(vals, np.ndarray):
        return vals.astype(np.int64), pa.array(vals.astype(np.int32), pa.int32()), None
    arr = vals if isinstance(vals, pa.Array) else vals.combine_chunks()
    arr = arr.cast(pa.int32())
    valid = np.asarray(arr.is_valid())
    lens = np.asarray(pa.compute.fill_null(arr, 0), dtype=np.int64)
    return lens, arr, valid


def _narrow(arr: pa.Array) -> pa.Array:
    """Shape an array for Spark's Arrow interchange (one shared helper:
    codecs.container._narrow_interchange — large types narrow, fixed-size
    binary reads as binary, non-ns TIME units read as time64[ns])."""
    from .codecs.container import _narrow_interchange

    return _narrow_interchange(arr)


def decode_chunk_row(
    payloads: dict[str, bytes], columns: tuple[str, ...] = ALL_COLUMNS
) -> pa.Table:
    """One chunk's self-describing payloads → the original sequence rows.

    Only the payloads the requested `columns` need are decoded (the S3
    column-chunk-read analog applied to decode: at 10^12 rows a tokens-only
    reader must not pay for doc_id/source byte streams). Payloads are fully
    self-describing (dtype + validity in the container header), so extra
    columns decode with no side channel; null token rows are restored from
    the row-validity bitmap the n_tok payload carries."""
    lens = ntok = valid = None
    if "n_tok" in payloads:
        lens, ntok, valid = _ntok_parts(payloads["n_tok"])
    arrays: dict[str, pa.Array] = {}
    for c in columns:
        if c == "doc_id":
            arrays[c] = _narrow(decode_column_arrow(payloads["doc_id"]))
        elif c == "source":
            arrays[c] = _narrow(decode_column_arrow(payloads["source"]))
        elif c == "n_tok":
            arrays[c] = ntok
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
            offsets = pa.array(offsets64.astype(np.int32), type=pa.int32())
            values = pa.array(flat, type=pa.int32())
            if valid is None:
                arrays[c] = pa.ListArray.from_arrays(offsets, values)
            else:
                arrays[c] = pa.Array.from_buffers(
                    pa.list_(pa.int32()),
                    len(lens),
                    [
                        pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()),
                        offsets.buffers()[1],
                    ],
                    children=[values],
                )
        else:
            arrays[c] = _narrow(decode_column_arrow(payloads[c]))
    return pa.table({c: arrays[c] for c in columns})


def decode_chunk_rows_for_ids(
    payloads: dict[str, bytes], want_ids: set, columns: tuple[str, ...]
) -> tuple[pa.Table, int]:
    """Point-lookup decode of ONE chunk: only the rows whose doc_id is in
    `want_ids` — and for FLAG_BLOCKED extras (the R10 small-pages knob)
    only the payload BLOCKS covering those rows. Returns (rows, payload
    bytes actually decoded) so tests and tooling can assert the random-
    access contract; canonical columns decode whole (tokens' flat stream
    is offset-addressed through n_tok, not blocked) and count fully."""
    from .codecs.container import decode_list_rows

    doc = _narrow(decode_column_arrow(payloads["doc_id"]))
    mask = pa.compute.is_in(doc, value_set=pa.array(sorted(want_ids), doc.type))
    idx = np.nonzero(np.asarray(pa.compute.fill_null(mask, False)))[0]
    canonical = tuple(c for c in columns if c in ALL_COLUMNS)
    extras = [c for c in columns if c not in ALL_COLUMNS]
    touched = len(payloads["doc_id"])
    arrays: dict[str, pa.Array] = {}
    if canonical:
        base = decode_chunk_row(payloads, canonical)
        touched += sum(
            len(payloads[p]) for p in _payloads_for(canonical) if p != "doc_id"
        )
        taken = base.take(idx)
        for c in canonical:
            arrays[c] = taken.column(c).combine_chunks()
    for c in extras:
        vals, t = decode_list_rows(payloads[c], idx)
        arrays[c] = _narrow(vals)
        touched += t
    return pa.table({c: arrays[c] for c in columns}), touched


def decode_chunk(t: pa.Table) -> pa.Table:
    """Decode a table of encoded chunk rows (kernel entry; also usable
    standalone on a driver-side pyarrow table). Canonical columns only."""
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


def extra_types_of(encoded: DataFrame, strict: bool = True) -> dict[str, str]:
    """Extra decoded columns and their Spark types, read from the chunk
    metrics (one tiny aggregate over the metadata columns — payloads stay
    untouched; O(#columns) rows reach the driver). `strict=False` tolerates
    columns with no metrics rows yet (a schema-only/empty table, e.g. the
    kept-set of an all-small compaction) instead of raising; conflicting
    dtypes raise either way."""
    payload_cols = [c[len("payload_") :] for c in encoded.columns if c.startswith("payload_")]
    extras = [c for c in payload_cols if c not in ALL_COLUMNS]
    if not extras:
        return {}
    rows = (
        encoded.select(F.explode("columns").alias("c"))
        .select(F.col("c.column").alias("column"), F.col("c.dtype").alias("dtype"))
        .filter(F.col("column").isin(extras))
        .distinct()
        .collect()
    )
    types: dict[str, str] = {}
    for r in rows:
        prev = types.setdefault(r["column"], r["dtype"])
        if prev != r["dtype"]:
            # an append that slipped past the schema guard (or a hand-mixed
            # table) stored two dtypes for one column; silently keeping one
            # would declare a mapInArrow schema half the payloads violate
            raise ValueError(
                f"column {r['column']!r} stores conflicting dtypes "
                f"{sorted({prev, r['dtype']})}; the table mixes incompatible "
                "appends — re-encode it into a fresh out_dir"
            )
    missing = [c for c in extras if c not in types]
    if missing and strict:
        raise ValueError(f"no dtype metadata for extra columns {missing}")
    return {c: types[c] for c in extras if c in types}  # input-order


def decode_dataframe(
    encoded: DataFrame,
    columns: tuple[str, ...] | list[str] | None = None,
    extra_types: dict[str, str] | None = None,
) -> DataFrame:
    """Shuffle-free decode: column-pruned scan → mapInArrow.

    `columns` projects the decode: only the payload columns those outputs
    need are scanned (parquet column pruning skips the rest entirely) and
    decoded. Default = all four sequence columns plus any extras named in
    `extra_types` (column → Spark DDL type; see extra_types_of /
    decode() for the metadata-driven path). mapInArrow needs the output
    schema at plan time, which is why extras carry their type here even
    though each payload is self-describing at runtime."""
    extra_types = dict(extra_types or {})
    payload_cols = {c[len("payload_") :] for c in encoded.columns if c.startswith("payload_")}
    unk = [c for c in extra_types if c not in payload_cols]
    if unk:
        raise ValueError(f"extra_types names columns with no payload: {unk}")
    cols = tuple(columns) if columns is not None else (*ALL_COLUMNS, *extra_types)
    need = _payloads_for(cols, extra_types)
    schema = ", ".join(
        f"{c} {_COLUMN_TYPES.get(c) or extra_types[c]}" for c in cols
    )

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
    column pruning keeps it metrics-weight — and rejoins as a left-semi
    with NO forced broadcast hint: AQE picks broadcast at any realistic
    scale (the keep side is two thin columns), while at the 10^12-row
    design point (~1.5e7 chunks) a FORCED broadcast would pin hundreds of
    MB on every executor; AQE can fall back to a shuffled semi-join of the
    key columns only — payload bytes are never shuffled either way. No-op
    (and plan-free) when the input has no attempt partition column (e.g.
    the lazy output of encode_dataframe, which is duplicate-free by
    construction)."""
    if "attempt" not in encoded.columns:
        return encoded
    keep = (
        encoded.select("chunk_id", "attempt")
        .groupBy("chunk_id")
        .agg(F.min("attempt").alias("attempt"))
    )
    return encoded.join(keep, ["chunk_id", "attempt"], "left_semi")


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/encoded")


def _attempt_count(spark: SparkSession, out_dir: str) -> int | None:
    """Number of `attempt=N` partition dirs under the encoded table, via the
    Hadoop FS API (one driver-side listStatus — no Spark job), or None when
    the listing fails (non-FS sources): callers must then assume many.

    Duplicate chunk rows can only exist ACROSS attempts (one applyInArrow
    output row per chunk within an attempt; a crash-resume lands the
    re-encode in a fresh attempt dir), so a single-attempt table needs no
    dedup pass — the common case pays zero extra jobs for crash safety."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/encoded")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return None
        n = 0
        for st in fs.listStatus(p):
            if st.getPath().getName().startswith("attempt="):
                n += 1
        return n
    except Exception:
        return None


def decode(
    spark: SparkSession,
    out_dir: str,
    columns: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Decode a stored table — extras (and their Spark types) discovered
    from the chunk metrics automatically. Tables with a single attempt
    partition (the overwhelmingly common case) skip the dedup semi-join
    outright — see _attempt_count."""
    enc = read_encoded(spark, out_dir)
    if _attempt_count(spark, out_dir) != 1:
        enc = dedup_attempts(enc)
    return decode_dataframe(enc, columns, extra_types=extra_types_of(enc))


def _column_bloom_expr(encoded: DataFrame, column: str):
    """The stored per-column bloom blob for `column`, or a NULL literal on
    tables written before the metrics struct carried one."""
    meta_fields = set(encoded.schema["columns"].dataType.elementType.fieldNames())
    if "bloom" not in meta_fields:
        return F.lit(None).cast("binary")
    return F.element_at(
        F.filter("columns", lambda c: c["column"] == F.lit(column)), 1
    )["bloom"]


def chunks_containing_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """Chunk ids whose token bloom filter admits `token` (parity with the
    reference's bloom directives, prescription.rs:113-130 / fix.rs:168-182).

    Chunks encoded without a filter can't be pruned and are kept. The probe
    is an Arrow-batched pandas UDF over (chunk_id, bloom) only — parquet
    column pruning keeps payload bytes unread."""
    return chunks_containing_value(spark, out_dir, "tokens", token)


def _bloom_probe_value(encoded: DataFrame, column: str, value) -> int:
    """Convert a user-facing probe value into the filter's build domain —
    the same carrier _bloom_of hashed at encode time: strings → FNV-1a-64,
    floats → their IEEE bit pattern, decimals → the unscaled int (scale
    read from the stored dtype), temporals → their carrier int, ints →
    themselves. Probing in the wrong domain would produce bloom FALSE
    NEGATIVES (chunks that contain the value silently pruned)."""
    import datetime as _dt
    from decimal import Decimal

    from .codecs.bloom import hash_string

    if isinstance(value, (str, bytes)):
        return hash_string(value)
    rows = (
        encoded.select(F.explode("columns").alias("c"))
        .select(F.col("c.column").alias("column"), F.col("c.dtype").alias("dtype"))
        .filter(F.col("column") == column)
        .limit(1)
        .collect()
    )
    dtype = rows[0]["dtype"] if rows else "bigint"
    elem = dtype[len("array<") : -1] if dtype.startswith("array<") else dtype
    if elem in ("float", "double"):
        w = np.float32 if elem == "float" else np.float64
        return int(np.array([value], dtype=w).view(np.int32 if elem == "float" else np.int64)[0])
    if elem.startswith("decimal"):
        import decimal as _decimal

        scale = int(elem.rstrip(")").split(",")[1])
        d = value if isinstance(value, Decimal) else Decimal(str(value))
        # prec=60 keeps all 38 digits of a decimal128 exact (the default
        # 28-digit context would silently round the unscaled int)
        u = int(d.scaleb(scale, _decimal.Context(prec=60)))
        # the filter's build domain is the signed LO WORD of the 16 B
        # unscaled storage (identity for precision ≤ 18; for decimal128 a
        # lo-word filter is sound — it only ever adds false positives)
        return ((u + (1 << 63)) % (1 << 64)) - (1 << 63)
    if elem in _ZONE_TEMPORAL and isinstance(value, (_dt.date, _dt.datetime, _dt.time)):
        tc = _stored_dtype_code(encoded, column) if elem == "time(6)" else None
        return _temporal_carrier(elem, value, time_code=tc)
    return int(value)


def chunks_containing_value(
    spark: SparkSession, out_dir: str, column: str, value
) -> DataFrame:
    """Chunk ids whose `column` membership filter admits `value` — the
    per-column generalization (any column given `set column C bloom_filter
    true`; string values probe via the same FNV-1a hash the build used).
    The tokens filter lives in the top-level bloom column, every other
    column's in its metrics row. Chunks without a filter are kept. Decimal
    columns build their filters over the UNSCALED int carrier — probe them
    with the unscaled integer, not the Decimal value."""
    from pyspark.sql.functions import pandas_udf

    from .codecs.bloom import hash_string, might_contain

    # dedup attempts: a crash-resumed table carries superseded chunk rows
    # in later attempt partitions — without this, every surviving chunk_id
    # would appear once per attempt in the public candidate set
    enc = dedup_attempts(read_encoded(spark, out_dir))
    known = {c[len("payload_") :] for c in enc.columns if c.startswith("payload_")}
    if column not in known:
        # a typo'd column would otherwise silently admit EVERY chunk (no
        # metrics row → NULL blob → unprunable) — fail loudly instead
        raise ValueError(f"no column {column!r} in the stored table; have {sorted(known)}")
    probe_val = _bloom_probe_value(enc, column, value)

    @pandas_udf("boolean")
    def probe(blooms: pd.Series) -> pd.Series:
        return blooms.map(
            lambda b: True if b is None else might_contain(b, probe_val)
        )

    blob = F.col("bloom") if column == "tokens" else _column_bloom_expr(enc, column)
    return enc.filter(probe(blob)).select("chunk_id")


def scan_token(spark: SparkSession, out_dir: str, token: int) -> DataFrame:
    """All rows whose token array contains `token`, decoding only chunks the
    bloom filters admit (semi-join — candidate sets never hit the driver)."""
    cands = chunks_containing_token(spark, out_dir, token)
    pruned = dedup_attempts(
        read_encoded(spark, out_dir).join(cands, "chunk_id", "left_semi")
    )
    return decode_dataframe(pruned, extra_types=extra_types_of(pruned)).filter(
        F.array_contains("tokens", F.lit(int(token)))
    )


# lookup()'s hybrid candidate pruning: at most this many candidate chunk
# ids collect into a literal isin (parquet row-group pruning); past it the
# broadcast semi-join keeps the candidate set off the driver entirely
LOOKUP_ISIN_CAP = 256

_ZONE_SCALARS = {"int", "bigint", "smallint", "tinyint"}
# temporal carriers: stored min/max are the carrier ints (µs / days / ns)
_ZONE_TEMPORAL = {"timestamp_ntz", "timestamp", "date", "time(6)"}


_TIME_TICKS_PER_SEC = {13: 10**9, 14: 10**6, 15: 10**3, 16: 1}  # DT_TIME_NS/US/MS/S


def _stored_dtype_code(encoded: DataFrame, column: str) -> int | None:
    """Exact container dtype CODE of a stored column, sniffed from the
    12-byte v3 frame header of ONE payload cell. The metrics DDL erases
    information the probes need — all four TIME units store as 'time(6)'
    but their carriers differ by factors of 1000, so a DDL-derived carrier
    silently zone-prunes or bloom-rejects chunks that contain matches.
    Reads one row's payload bytes only (bounded by one chunk)."""
    row = (
        encoded.select(F.substring(F.col(f"payload_{column}"), 1, 12).alias("h"))
        .filter(F.col("h").isNotNull())
        .first()
    )
    if row is None:
        return None
    h = bytes(row["h"])
    if len(h) >= 7 and h[:2] == b"TL" and h[2] == 3:
        return h[6]
    return None  # v2 frame: no dtype byte (TIME never ships as v2)


def _temporal_carrier(dtype: str, v, time_code: int | None = None) -> int:
    """A date/datetime/time bound → the column's stored carrier int
    (days / µs / time ticks) for the zone-map overlap predicate.
    `time_code`: the stored DT_TIME_* code for 'time(6)' columns (the DDL
    alone cannot recover the tick unit); defaults to nanoseconds."""
    import datetime as _dt

    if dtype == "date" and isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return (v - _dt.date(1970, 1, 1)).days
    if dtype == "timestamp_ntz" and isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            raise ValueError(
                f"bound {v!r} carries a zone but column dtype is "
                "timestamp_ntz (zoneless wall time) — pass a naive datetime"
            )
        # integer arithmetic: total_seconds() is a float and loses the last
        # microsecond for ~1% of values, silently shrinking the zone bound
        return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    if dtype == "timestamp" and isinstance(v, _dt.datetime):
        # zoned column: the stored carrier is the INSTANT (µs since the
        # Unix epoch, UTC). A naive bound is taken as UTC wall time — the
        # storage convention — never the process-local zone.
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return (v - epoch) // _dt.timedelta(microseconds=1)
    if dtype == "time(6)" and isinstance(v, _dt.time):
        if v.tzinfo is not None:
            raise ValueError(
                f"bound {v!r} carries a UTC offset but column dtype is "
                "time(6) (zoneless) — pass a naive time"
            )
        tps = _TIME_TICKS_PER_SEC.get(time_code, 10**9)
        ticks = ((v.hour * 60 + v.minute) * 60 + v.second) * tps
        return ticks + v.microsecond * tps // 10**6
    raise ValueError(f"bound {v!r} does not match the column's {dtype} carrier")


def scan_value_range(spark: SparkSession, out_dir: str, column: str, lo, hi) -> DataFrame:
    """Zone-map scan: rows whose `column` has a value in [lo, hi], decoding
    ONLY chunks whose stored per-column min/max overlap the range — the
    chunk metrics ARE zone maps (the reference reads min/max statistics per
    column chunk for its rules, column_context.rs:402-438; here they prune
    a value scan, the classic row-group-elimination role Parquet gives
    them).

    Chunks whose stats were blanked (`statistics none`: distinct_est = 0
    with values present — the X1 presence invariant) cannot be pruned and
    are kept. Covers int-family scalars, `tokens`, int-family list extras,
    and temporal columns (date / timestamp_ntz / time — pass
    datetime.date / datetime.datetime / datetime.time bounds);
    float/string carriers store bit-pattern or hashed bounds and are
    rejected (use a full decode + filter for those)."""
    from .encode_job import column_metrics

    enc = read_encoded(spark, out_dir)
    m = column_metrics(enc).filter(F.col("column") == column)
    first = m.select("dtype").first()
    if first is None:
        raise ValueError(f"no column {column!r} in the stored metrics")
    dtype = first["dtype"]
    elem = dtype[len("array<") : -1] if dtype.startswith("array<") else dtype
    if elem in _ZONE_TEMPORAL:
        tc = _stored_dtype_code(enc, column) if elem == "time(6)" else None
        lo_c = _temporal_carrier(elem, lo, time_code=tc)
        hi_c = _temporal_carrier(elem, hi, time_code=tc)
    elif elem in _ZONE_SCALARS:
        lo_c, hi_c = int(lo), int(hi)
    else:
        raise ValueError(
            f"zone-map scan needs an int-family or temporal column; "
            f"{column!r} stores {dtype!r}"
        )
    is_list = dtype.startswith("array<")
    # "has values but blanked stats" — list columns count ELEMENTS in
    # n_values and null ROWS in null_count (mixed units; same special case
    # lint_encoded carries), so their data-exists test is n_values > 0
    has_values = F.col("n_values") > (F.lit(0) if is_list else F.col("null_count"))
    blanked = (F.col("distinct_est") == 0) & has_values
    overlap = (F.col("min_val") <= hi_c) & (F.col("max_val") >= lo_c)
    cands = m.filter(blanked | overlap).select("chunk_id").distinct()
    pruned = dedup_attempts(enc.join(cands, "chunk_id", "left_semi"))
    dec = decode_dataframe(pruned, extra_types=extra_types_of(enc))
    if elem == "timestamp":
        # zoned column: compare INSTANTS on both sides. F.lit(datetime) is
        # interpreted in the caller's session zone, so on a non-UTC session
        # the post-decode filter window would diverge from the carrier-int
        # pruning window (silently dropping rows whose chunks were pruned)
        # — unix_micros() is session-zone-independent, matching the pruning
        # arithmetic exactly.
        lo_t, hi_t = F.lit(lo_c), F.lit(hi_c)
        conv = F.unix_micros
    else:
        lo_t, hi_t = (
            (F.lit(lo), F.lit(hi)) if elem in _ZONE_TEMPORAL else (F.lit(lo_c), F.lit(hi_c))
        )
        conv = lambda c: c  # noqa: E731
    if is_list:
        pred = F.exists(column, lambda v: (conv(v) >= lo_t) & (conv(v) <= hi_t))
    else:
        pred = conv(F.col(column)).between(lo_t, hi_t)
    return dec.filter(pred)


def lookup(spark: SparkSession, out_dir: str, doc_ids: list[str]) -> DataFrame:
    """Point lookup: decode ONLY the chunks that can contain a requested id.

    Chunk assignment is a pure function of the data (`prefix # xxhash64(doc_id)
    % nbuckets`, chunking.py), and every chunk row carries its group's
    nbuckets — so a doc's candidate chunk ids are recomputed exactly, with
    the same Spark hash, from the distinct (prefix, nbuckets) set. The
    candidate-id frame joins the encoded scan as a BROADCAST left-semi, so
    the candidate set never lands on the driver: a long-lived streamed table
    accumulates one prefix per micro-batch/compaction pass, and a collected
    `chunk_id IN (...)` list would grow O(#ids × #batches) driver-side
    (round-3 verdict). The broadcast also feeds Spark's runtime row-group
    pruning of the scan; only candidate chunks pay the decode UDF. At 10^12
    rows a lookup touches O(#ids × #prefixes) chunks, not the corpus —
    compaction keeps #prefixes small.
    """
    if not doc_ids:
        return decode(spark, out_dir).limit(0)
    enc = read_encoded(spark, out_dir)
    from .chunking import chunk_id_prefix

    groups = enc.select(chunk_id_prefix().alias("prefix"), "nbuckets").distinct()
    ids = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    cands = groups.crossJoin(F.broadcast(ids)).select(
        F.concat_ws(
            "#", "prefix", F.pmod(F.xxhash64("doc_id"), F.col("nbuckets"))
        ).alias("chunk_id")
    )
    # hybrid pruning: a small candidate set (the point-lookup case) collects
    # into a LITERAL isin predicate — parquet pushes it into row-group
    # pruning, so the scan reads O(#candidates) payload bytes instead of
    # every row's (the semi-join filters rows but not I/O; at the 5k-chunk
    # rehearsal that was the whole lookup wall). The CAP bounds the driver
    # — the round-3 finding stands: an UNBOUNDED literal list grows
    # O(#ids × #batches) on long-lived streamed tables, so a batch lookup
    # past the threshold keeps the broadcast semi-join, which never lands
    # the candidate set on the driver.
    head = cands.distinct().limit(LOOKUP_ISIN_CAP + 1).collect()
    if len(head) <= LOOKUP_ISIN_CAP:
        pruned = enc.filter(F.col("chunk_id").isin([r["chunk_id"] for r in head]))
    else:
        pruned = enc.join(F.broadcast(cands), "chunk_id", "left_semi")
    # second pruning stage: chunks that carry a doc_id membership filter
    # (set column doc_id bloom_filter true) drop out when it rejects EVERY
    # requested id — a candidate bucket holds ~n_rows/nbuckets unrelated
    # docs, and without the filter each one pays a full decode
    meta_fields = set(enc.schema["columns"].dataType.elementType.fieldNames())
    if "bloom" in meta_fields:
        from pyspark.sql.functions import pandas_udf

        from .codecs.bloom import hash_string, might_contain_any

        id_hashes = np.array([hash_string(d) for d in doc_ids], dtype=np.int64)

        @pandas_udf("boolean")
        def admits(blooms: pd.Series) -> pd.Series:
            return blooms.map(
                lambda b: True if b is None else might_contain_any(b, id_hashes)
            )

        pruned = pruned.filter(admits(_column_bloom_expr(enc, "doc_id")))
    pruned = dedup_attempts(pruned)
    # row-targeted decode: only matched rows materialize, and FLAG_BLOCKED
    # extras (R10 small-pages) decode only the blocks covering them —
    # O(#ids) payload bytes per candidate chunk instead of the whole chunk
    extra_types = extra_types_of(enc)
    cols = (*ALL_COLUMNS, *extra_types)
    need = _payloads_for(cols, extra_types)
    schema = ", ".join(f"{c} {_COLUMN_TYPES.get(c) or extra_types[c]}" for c in cols)
    want = set(doc_ids)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            t = pa.Table.from_batches([batch])
            for i in range(t.num_rows):
                out, _ = decode_chunk_rows_for_ids(
                    {c: t.column(f"payload_{c}")[i].as_py() for c in need}, want, cols
                )
                if out.num_rows:
                    yield from out.to_batches()

    return pruned.select(*[f"payload_{p}" for p in need]).mapInArrow(fn, schema)
