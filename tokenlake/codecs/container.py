"""Self-describing encoded-payload container + general-purpose outer layer.

Mirrors the reference's two-level choice: a *light encoding* (dictionary /
delta / RLE / bit-pack — reference rules R1/R4/R5/R6) wrapped in an optional
*general-purpose codec* (reference R2 `compression-codec-upgrade`,
src/parquet-linter/src/rules/compression_codec.rs:125-298, picks ZSTD(3) for
size vs LZ4 for speed; R3 `low-compression-ratio`,
src/parquet-linter/src/rules/compression_ratio.rs:14-76, drops the outer layer
when it saves <5%). The outer codec set matches the reference's prescription
grammar (prescription.rs:583-622): uncompressed / snappy / lz4 / zstd(1..22) /
gzip(0..9) / brotli(0..11), plus stdlib zlib — all but zlib via pyarrow's
bundled codecs.

Layout v3: b"TL" | version u8 | codec_id u8 | outer_id u8 | level u8 |
           dtype u8 | flags u8 | raw_len u32 (pre-outer body bytes) | payload
Layout v2 (still decoded): same without the dtype/flags bytes — dtype is
implied by the codec family (int32 for int codecs, string for str codecs)
and flags = 0. Compaction copies payloads byte-identically, so mixed-version
tables decode fine.

The dtype byte makes every payload self-describing across the full scalar
type registry (the reference analyzes 8 physical parquet types,
column_context.rs:213-292); flags bit 0 marks a validity-bitmap section —
when set, the body is `u32 n_total | packbits(valid, little) | inner_body`
and the inner body encodes only the valid values (the reference carries
null_count through every stats path, column_context.rs:37-41,144-158, and
its rewrite preserves null data losslessly).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from . import intcodecs, strcodecs

MAGIC = b"TL"
VERSION = 3
_V2 = 2

# logical dtype registry: container code → (name, spark ddl, arrow type)
DT_INT32, DT_INT64, DT_INT16, DT_INT8, DT_FLOAT32, DT_FLOAT64 = range(6)
DT_BOOL, DT_STRING, DT_BINARY, DT_TIMESTAMP_US, DT_DATE32 = range(6, 11)
# parameterized types (reference column_context.rs:215-291 analyzes
# FIXED_LEN_BYTE_ARRAY and decimal physical types): the dtype byte alone
# can't carry (precision, scale) / byte width, so these prepend a tiny type
# header to the codec body — u8 precision | u8 scale for decimal (unscaled
# int64 carrier, precision ≤ 18), u32 width for fixed-size binary (str
# family; the constant lengths FOR-pack to ~nothing).
DT_DECIMAL64, DT_FIXED_BINARY = 11, 12
# TIME family (reference analyzes Time ms/us/ns, column_context.rs:215-291):
# one code per unit so the dtype byte alone reconstructs the arrow type —
# time64 units ride the wide int path, time32 units the narrow one. Spark's
# TIME(p) (behind spark.sql.timeType.enabled) interchanges as time64[ns].
DT_TIME_NS, DT_TIME_US, DT_TIME_MS, DT_TIME_S = 13, 14, 15, 16
# Zoned timestamp (Spark's default TIMESTAMP / TIMESTAMP_LTZ): the stored
# value is the INSTANT — µs since the Unix epoch, zone-independent — on the
# same wide-int carrier as timestamp_ntz. Decode restores tz=UTC: Spark
# treats TIMESTAMP as an instant (display zone is a session property), so
# the roundtrip is semantically lossless; the producer's wall-zone string
# is deliberately not stored (it is presentation, not data).
DT_TIMESTAMP_TZ_US = 17
# Full-width decimal128 (precision 19..38): the 16 B two's-complement
# unscaled int splits into two int64 word streams — lo (the low 64 bits,
# signed view of the raw word) and hi (the arithmetic high word). Each word
# stream is its own full inner TL frame (the FLAG_LIST composite pattern):
# values that fit 64 bits make hi a constant 0/-1 sign plane that FOR/RLE
# packs to ~nothing, so a decimal(38,s) column holding ordinary magnitudes
# costs the same as the decimal64 carrier. Body layout (after the nulls
# section): u8 precision | u8 scale | u32 lo_frame_len | lo_frame | hi_frame.
DT_DECIMAL128 = 18

DTYPE_SPARK = {
    DT_INT32: "int", DT_INT64: "bigint", DT_INT16: "smallint", DT_INT8: "tinyint",
    DT_FLOAT32: "float", DT_FLOAT64: "double", DT_BOOL: "boolean",
    DT_STRING: "string", DT_BINARY: "binary",
    DT_TIMESTAMP_US: "timestamp_ntz", DT_DATE32: "date",
    # Spark views a stored fixed-size binary as plain binary; decimal DDL
    # needs (p, s) — use spark_ddl_of_arrow for the exact string
    DT_FIXED_BINARY: "binary",
    DT_TIME_NS: "time(6)", DT_TIME_US: "time(6)",
    DT_TIME_MS: "time(6)", DT_TIME_S: "time(6)",
    DT_TIMESTAMP_TZ_US: "timestamp",
}
SPARK_DTYPE = {v: k for k, v in DTYPE_SPARK.items() if k <= DT_DATE32}

# dtypes whose value stream runs through the 64-bit ("wide") int codec path
_WIDE_DTYPES = frozenset({DT_INT64, DT_FLOAT64, DT_TIMESTAMP_US, DT_TIMESTAMP_TZ_US,
                          DT_DECIMAL64, DT_DECIMAL128, DT_TIME_NS, DT_TIME_US})
_STR_DTYPES = frozenset({DT_STRING, DT_BINARY, DT_FIXED_BINARY})

FLAG_NULLS = 1  # body carries a validity-bitmap section
# FLAG_BLOCKED (list columns only): the body is an intra-chunk block index —
# <I block_rows> <I nblocks> <Q offsets[nblocks+1]> concat(inner frames) —
# each inner frame a complete FLAG_LIST frame over `block_rows` rows with its
# own outer layer. R10's `small-pages` physical knob
# (vector_embedding.rs:19-76): a point lookup decodes only the block(s)
# holding its rows, O(doc) payload bytes instead of the whole chunk.
FLAG_BLOCKED = 4
# list-typed payload: body = u32 lengths_frame_len | lengths_frame |
# values_frame, both full TL frames (outer "none" inside — the composite's
# own outer covers everything once). The header's codec byte is the VALUES
# codec (so codec_of reports the payload that matters and the BSS
# forced-outer-trial logic applies) and the dtype byte is the ELEMENT dtype.
# Null list ROWS ride the lengths frame's validity bitmap; null ELEMENTS
# ride the values frame's. This is the tokens/n_tok pattern generalized to
# any element type — the reference detects fixed-fanout embedding columns
# and prescribes for them (rules/vector_embedding.rs:19-76); here the same
# column finally lands on a real codec path (floats → bss).
FLAG_LIST = 2

CODEC_NAMES = {**intcodecs.INT_CODEC_NAMES, **strcodecs.STR_CODEC_NAMES}
CODEC_IDS = {**intcodecs.INT_CODEC_IDS, **strcodecs.STR_CODEC_IDS}

OUTER_NONE, OUTER_ZLIB, OUTER_ZSTD, OUTER_LZ4, OUTER_SNAPPY, OUTER_GZIP, OUTER_BROTLI = range(7)
OUTER_NAMES = {
    OUTER_NONE: "none",
    OUTER_ZLIB: "zlib",
    OUTER_ZSTD: "zstd",
    OUTER_LZ4: "lz4",
    OUTER_SNAPPY: "snappy",
    OUTER_GZIP: "gzip",
    OUTER_BROTLI: "brotli",
}
OUTER_IDS = {v: k for k, v in OUTER_NAMES.items()}
_LEVELED = {"zlib", "zstd", "gzip", "brotli"}

# R3 analog: keep the outer layer only if it saves ≥5% (ratio > 0.95 ⇒ skip,
# reference compression_ratio.rs:47-57)
OUTER_KEEP_RATIO = 0.95
# R2 analog: chunks larger than 4 MB prefer the speed codec (LZ4) over the
# size codec (ZSTD(3)) — compression_codec.rs:8-20
SPEED_THRESHOLD_BYTES = 4 << 20
ZSTD_LEVEL = 3
_TRIAL_BYTES = 1 << 16  # outer-layer trial sample size

_HDR = struct.Struct("<2sBBBBBBI")   # v3
_HDR_V2 = struct.Struct("<2sBBBBI")  # legacy read path


def _outer_compress(name: str, level: int, data: bytes) -> bytes:
    if name == "zlib":
        return zlib.compress(data, level)
    if name in _LEVELED:
        return bytes(pa.Codec(name, compression_level=level).compress(data))
    return bytes(pa.Codec(name).compress(data))


def _outer_decompress(name: str, payload, raw_len: int) -> bytes:
    if name == "zlib":
        return zlib.decompress(payload)
    return bytes(pa.Codec(name).decompress(bytes(payload), raw_len))


def wrap(
    codec_id: int,
    body: bytes,
    outer: str = "auto",
    dtype: int = DT_INT32,
    flags: int = 0,
) -> bytes:
    """Frame a codec body, optionally outer-compressing it.

    outer: "auto" (R2/R3 policy), "none", or "<codec>[:level]" with codec in
    zlib/zstd/lz4/snappy/gzip/brotli.

    `bss` bodies force an outer trial even when the R3 tail sample says no:
    byte-stream-split only pays THROUGH the outer codec (the body itself is
    plain-size), and its clustered exponent/sign planes sit at the front of
    the body where the tail sample never looks.
    """
    if len(body) >= 1 << 32:
        # raw_len is a u32; a silent modular wrap here would make the decode
        # integrity check reject (or worse, mis-slice) a valid payload. The
        # default chunk caps keep bodies ~16 MB; only an extreme
        # max_chunk_values override can reach this.
        raise ValueError(f"codec body {len(body)} B exceeds the 4 GiB container limit")
    oid, level, payload = OUTER_NONE, 0, body
    if outer == "auto":
        # R2: speed codec for big bodies, size codec otherwise
        name = "lz4" if len(body) > SPEED_THRESHOLD_BYTES else "zstd"
        level = 0 if name == "lz4" else ZSTD_LEVEL
        # R3 trial on a bounded tail sample first (the packed value stream
        # dominates the bytes; reference samples ≤16,384 rows,
        # column_context.rs:543): never pay full-body compression to learn "no"
        whole = len(body) <= _TRIAL_BYTES  # sample IS the body: trial = answer
        sample = body if whole else body[-_TRIAL_BYTES:]
        ztrial = None
        if codec_id != intcodecs.BSS:
            ztrial = _outer_compress(name, level, sample)
        if codec_id == intcodecs.BSS or len(ztrial) < OUTER_KEEP_RATIO * len(sample):
            # small frames (n_tok/doc_id/source on every chunk) reuse the
            # trial output instead of compressing the same bytes twice
            z = ztrial if (whole and ztrial is not None) else _outer_compress(name, level, body)
            if len(z) < OUTER_KEEP_RATIO * len(body):
                oid, payload = OUTER_IDS[name], z
            else:
                level = 0
        else:
            level = 0
    elif outer != "none":
        name, _, lv = outer.partition(":")
        if name not in OUTER_IDS or name == "none":
            raise ValueError(f"unknown outer layer: {outer}")
        level = int(lv) if lv else (ZSTD_LEVEL if name == "zstd" else 6 if name in _LEVELED else 0)
        oid, payload = OUTER_IDS[name], _outer_compress(name, level, body)
    return _HDR.pack(MAGIC, VERSION, codec_id, oid, level, dtype, flags, len(body)) + payload


def unwrap(buf: bytes | memoryview) -> tuple[int, memoryview, int, int]:
    """→ (codec_id, body, dtype, flags). Accepts v2 and v3 frames."""
    mv = memoryview(buf)
    if len(mv) < 3 or bytes(mv[:2]) != MAGIC:
        raise ValueError("bad container header")
    ver = mv[2]
    if ver == VERSION:
        if len(mv) < _HDR.size:  # truncated INSIDE the header: same error
            raise ValueError("bad container header (truncated)")
        _, _, codec_id, oid, _level, dtype, flags, raw_len = _HDR.unpack_from(mv, 0)
        body = mv[_HDR.size :]
    elif ver == _V2:
        if len(mv) < _HDR_V2.size:
            raise ValueError("bad container header (truncated)")
        _, _, codec_id, oid, _level, raw_len = _HDR_V2.unpack_from(mv, 0)
        dtype = DT_STRING if codec_id in strcodecs.STR_CODEC_NAMES else DT_INT32
        flags = 0
        body = mv[_HDR_V2.size :]
    else:
        raise ValueError("bad container header")
    if oid != OUTER_NONE:
        body = memoryview(_outer_decompress(OUTER_NAMES[oid], body, raw_len))
    # the header's raw_len is a validated integrity invariant: without it a
    # truncated outer-none payload would decode silently short (dec_plain
    # frombuffers whatever bytes remain)
    if len(body) != raw_len:
        raise ValueError(
            f"container body is {len(body)} B, header says {raw_len} B (truncated or corrupt)"
        )
    return codec_id, body, dtype, flags


def encode_int_column(arr: np.ndarray, codec: str, outer: str = "auto", fact=None) -> bytes:
    """Canonical int32 fast path (tokens / n_tok): no nulls, no dtype
    ceremony. `fact` forwards a precomputed factorization to enc_dict."""
    cid = intcodecs.INT_CODEC_IDS[codec]
    return wrap(cid, intcodecs.encode_int_body(cid, arr, fact=fact), outer, DT_INT32)


def encode_str_column(values, codec: str, outer: str = "auto") -> bytes:
    """Canonical non-null string path (doc_id / source)."""
    cid = strcodecs.STR_CODEC_IDS[codec]
    return wrap(cid, strcodecs.encode_str_body(cid, values), outer, DT_STRING)


# ---------------------------------------------------------------- generic column layer
# Arrow type → (dtype code, bit-pattern numpy view dtype). Every fixed-width
# type funnels into the int codec family on its bit pattern (floats included:
# the view is bit-exact, NaN payloads preserved); strings/binary use the str
# codec family.


def dtype_of_arrow(t: pa.DataType) -> int:
    if pa.types.is_int32(t):
        return DT_INT32
    if pa.types.is_int64(t):
        return DT_INT64
    if pa.types.is_int16(t):
        return DT_INT16
    if pa.types.is_int8(t):
        return DT_INT8
    if pa.types.is_float32(t):
        return DT_FLOAT32
    if pa.types.is_float64(t):
        return DT_FLOAT64
    if pa.types.is_boolean(t):
        return DT_BOOL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return DT_STRING
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return DT_BINARY
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            raise ValueError(
                f"timestamp type {t} not supported — cast to µs precision "
                "(Spark's native unit) first"
            )
        # zoned → the instant (µs since epoch, zone-independent); arrow's
        # storage for tz-aware timestamps is already UTC-normalized, so any
        # producer zone string maps to the same carrier ints
        return DT_TIMESTAMP_TZ_US if t.tz is not None else DT_TIMESTAMP_US
    if pa.types.is_date32(t):
        return DT_DATE32
    if pa.types.is_time64(t):
        return DT_TIME_NS if t.unit == "ns" else DT_TIME_US
    if pa.types.is_time32(t):
        return DT_TIME_MS if t.unit == "ms" else DT_TIME_S
    if pa.types.is_decimal(t):
        if t.bit_width > 128:
            raise ValueError(
                f"decimal type {t} not supported — precision ≤ 38 "
                "(decimal128) is the registry ceiling"
            )
        # p ≤ 18 keeps |unscaled| < 2^63 → single int64 carrier; wider
        # precisions split into lo/hi word streams (DT_DECIMAL128)
        return DT_DECIMAL64 if t.precision <= 18 else DT_DECIMAL128
    if pa.types.is_fixed_size_binary(t):
        return DT_FIXED_BINARY
    raise ValueError(f"unsupported column type for encoding: {t}")


def spark_ddl_of_arrow(t: pa.DataType) -> str:
    """Exact Spark DDL for a supported scalar type (decimal keeps its
    precision/scale; fixed-size binary reads back as Spark binary)."""
    code = dtype_of_arrow(t)
    if code in (DT_DECIMAL64, DT_DECIMAL128):
        return f"decimal({t.precision},{t.scale})"
    return DTYPE_SPARK[code]


def is_wide(dtype: int) -> bool:
    return dtype in _WIDE_DTYPES


def is_string_kind(dtype: int) -> bool:
    return dtype in _STR_DTYPES


def _decimal128_words(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Null-free arrow decimal128 array → (lo, hi) int64 word streams of the
    little-endian two's-complement 16 B unscaled storage. value =
    hi * 2^64 + uint64(lo)."""
    if len(arr) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    buf = arr.buffers()[1]
    pairs = np.frombuffer(buf, np.int64, count=2 * len(arr), offset=arr.offset * 16)
    return np.ascontiguousarray(pairs[0::2]), np.ascontiguousarray(pairs[1::2])


def decimal128_minmax(arr: pa.Array) -> tuple[int, int]:
    """Exact (min, max) UNSCALED ints of a non-empty null-free decimal128
    array, as Python ints (they may exceed int64 for precision > 18):
    lexicographic on (hi, unsigned lo)."""
    lo, hi = _decimal128_words(arr)
    ulo = lo.view(np.uint64)

    def _at(h: int, reduce) -> int:
        return int(h) * (1 << 64) + int(reduce(ulo[hi == h]))

    return _at(hi.min(), np.min), _at(hi.max(), np.max)


def int_view_of(arr: pa.Array, dtype: int) -> np.ndarray:
    """Bit-pattern numpy view of a null-free fixed-width arrow array:
    int32/int64 carrier for the int codec family."""
    if dtype in (DT_DECIMAL64, DT_DECIMAL128):
        # arrow decimal128 stores 16 B little-endian two's-complement
        # unscaled ints. For p ≤ 18 the low word IS the int64 value (sign
        # extension lives entirely in the high word). For wider precisions
        # this view is the LO WORD ONLY — good for codec selection and as a
        # sound bloom domain (v in chunk ⇒ lo(v) in filter; collisions on
        # the low word only ever ADD false positives) but NOT for ordering.
        return _decimal128_words(arr)[0]
    # temporal/wide branches FIRST: a plain to_numpy on these materializes
    # datetime objects — slow, and it REJECTS values the storage admits
    # (a timestamp past year 9999, a time64 ≥ 24 h raise "hour must be in
    # 0..23" style errors); the int cast is carrier-exact and total
    if dtype in (DT_INT64, DT_TIMESTAMP_US, DT_TIMESTAMP_TZ_US, DT_TIME_NS, DT_TIME_US):
        if dtype != DT_INT64:
            arr = arr.cast(pa.int64())
        return np.ascontiguousarray(arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    if dtype in (DT_DATE32, DT_TIME_MS, DT_TIME_S):
        return arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
    np_arr = arr.to_numpy(zero_copy_only=False)
    if dtype == DT_FLOAT32:
        return np.ascontiguousarray(np_arr, dtype=np.float32).view(np.int32)
    if dtype == DT_FLOAT64:
        return np.ascontiguousarray(np_arr, dtype=np.float64).view(np.int64)
    if dtype == DT_BOOL:
        return np_arr.astype(np.int32)
    return np.ascontiguousarray(np_arr, dtype=np.int32)


def _arrow_type_of(dtype: int) -> pa.DataType:
    return {
        DT_INT32: pa.int32(), DT_INT64: pa.int64(), DT_INT16: pa.int16(),
        DT_INT8: pa.int8(), DT_FLOAT32: pa.float32(), DT_FLOAT64: pa.float64(),
        DT_BOOL: pa.bool_(), DT_STRING: pa.large_string(), DT_BINARY: pa.large_binary(),
        DT_TIMESTAMP_US: pa.timestamp("us"), DT_DATE32: pa.date32(),
        DT_TIMESTAMP_TZ_US: pa.timestamp("us", tz="UTC"),
    }[dtype]


def _ints_to_arrow(vals: np.ndarray, dtype: int, deci: tuple[int, int] | None = None) -> pa.Array:
    """Decoded carrier ints → arrow array of the logical type (bit-exact)."""
    if dtype == DT_DECIMAL64:
        p, s = deci
        # rebuild the 16 B little-endian two's-complement storage: low word
        # is the carrier, high word its sign extension (arithmetic shift)
        pairs = np.empty((len(vals), 2), np.int64)
        pairs[:, 0] = vals
        pairs[:, 1] = np.asarray(vals, np.int64) >> 63
        return pa.Array.from_buffers(
            pa.decimal128(p, s), len(vals), [None, pa.py_buffer(pairs.tobytes())]
        )
    if dtype == DT_FLOAT32:
        return pa.array(vals.view(np.float32), pa.float32())
    if dtype == DT_FLOAT64:
        return pa.array(vals.view(np.float64), pa.float64())
    if dtype == DT_BOOL:
        return pa.array(vals.astype(bool), pa.bool_())
    if dtype == DT_TIMESTAMP_US:
        return pa.array(vals, pa.int64()).cast(pa.timestamp("us"))
    if dtype == DT_TIMESTAMP_TZ_US:
        return pa.array(vals, pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    if dtype in (DT_TIME_NS, DT_TIME_US):
        unit = "ns" if dtype == DT_TIME_NS else "us"
        return pa.array(vals, pa.int64()).cast(pa.time64(unit))
    if dtype in (DT_TIME_MS, DT_TIME_S):
        unit = "ms" if dtype == DT_TIME_MS else "s"
        return pa.array(vals.astype(np.int32), pa.int32()).cast(pa.time32(unit))
    if dtype == DT_DATE32:
        return pa.array(vals.astype(np.int32), pa.int32()).cast(pa.date32())
    return pa.array(vals.astype(_arrow_type_of(dtype).to_pandas_dtype(), copy=False), _arrow_type_of(dtype))


def encode_any_column(arr: pa.Array, codec: str, outer: str = "auto") -> bytes:
    """Encode an arrow array of ANY supported scalar type, nulls included.

    Nulls: the validity bitmap rides the container (FLAG_NULLS section), the
    inner codec sees only valid values — the reference's null-preserving
    rewrite (column_context.rs:144-158) realized at the container layer so
    every codec stays null-oblivious."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dtype = dtype_of_arrow(arr.type)
    n = len(arr)
    flags, prefix = 0, b""
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        prefix = struct.pack("<I", n) + np.packbits(valid, bitorder="little").tobytes()
        flags = FLAG_NULLS
        arr = arr.drop_null()
    if dtype == DT_DECIMAL128:
        lo, hi = _decimal128_words(arr)
        cid = intcodecs.INT_CODEC_IDS[codec]
        lo_frame = wrap(cid, intcodecs.encode_int_body(cid, lo, wide=True), "none", DT_INT64)
        # hi is usually a constant 0/-1 sign plane (values that fit 64
        # bits): FOR packs that to ~nothing; race plain as the safety net
        hi_frame = min(
            (
                wrap(c, intcodecs.encode_int_body(c, hi, wide=True), "none", DT_INT64)
                for c in (intcodecs.INT_CODEC_IDS["for"], intcodecs.INT_CODEC_IDS["plain"])
            ),
            key=len,
        )
        body = (
            struct.pack("<BB", arr.type.precision, arr.type.scale)
            + struct.pack("<I", len(lo_frame))
            + lo_frame
            + hi_frame
        )
        return wrap(cid, prefix + body, outer, dtype, flags)
    if is_string_kind(dtype):
        cid = strcodecs.STR_CODEC_IDS[codec]
        vals = arr.cast(pa.large_binary()) if dtype == DT_FIXED_BINARY else arr
        body = strcodecs.encode_str_body(cid, vals)
        if dtype == DT_FIXED_BINARY:
            body = struct.pack("<I", arr.type.byte_width) + body
    else:
        cid = intcodecs.INT_CODEC_IDS[codec]
        body = intcodecs.encode_int_body(cid, int_view_of(arr, dtype), wide=is_wide(dtype))
        if dtype == DT_DECIMAL64:
            body = struct.pack("<BB", arr.type.precision, arr.type.scale) + body
    return wrap(cid, prefix + body, outer, dtype, flags)


def encode_list_column(
    arr: pa.Array,
    values_codec: str,
    outer: str = "auto",
    values_body: bytes | None = None,
    block_rows: int | None = None,
) -> bytes:
    """Encode an arrow list array of ANY supported scalar element type.

    Layout (FLAG_LIST): the per-row element counts and the flattened values
    each become a full inner TL frame — self-describing, so decode needs no
    side channel. Lengths use FOR (a fixed-fanout embedding column packs to
    ~zero bits; ragged fanouts stay near their entropy); values run the
    caller-selected codec. Null rows and null elements are both preserved.

    `block_rows` (R10 small-pages): split the column into independently
    decodable blocks of that many rows behind an offset index
    (FLAG_BLOCKED) so `decode_list_rows` can decode O(rows-wanted) bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if block_rows is not None and len(arr) > block_rows:
        t0 = arr.type
        if pa.types.is_fixed_size_list(t0):
            arr = arr.cast(pa.list_(t0.value_type))
        subs = [
            encode_list_column(arr.slice(i, block_rows), values_codec, outer=outer)
            for i in range(0, len(arr), block_rows)
        ]
        offs = np.zeros(len(subs) + 1, np.uint64)
        np.cumsum([len(s) for s in subs], out=offs[1:])
        body = struct.pack("<II", block_rows, len(subs)) + offs.tobytes() + b"".join(subs)
        elem_dtype = dtype_of_arrow(arr.type.value_type)
        cid = (
            strcodecs.STR_CODEC_IDS[values_codec]
            if values_codec in strcodecs.STR_CODEC_IDS
            else intcodecs.INT_CODEC_IDS[values_codec]
        )
        # blocks compress individually; an outer layer over the index would
        # force a whole-frame decompress and defeat the random access
        return wrap(cid, body, "none", elem_dtype, FLAG_LIST | FLAG_BLOCKED)
    t = arr.type
    if pa.types.is_fixed_size_list(t):
        arr = arr.cast(pa.list_(t.value_type))
        t = arr.type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        raise ValueError(f"encode_list_column needs a list array, got {t}")
    elem_dtype = dtype_of_arrow(t.value_type)
    lengths = pa.compute.list_value_length(arr).cast(pa.int32())
    values = arr.flatten()  # valid rows' elements only (null rows add none)
    lengths_frame = encode_any_column(lengths, "for", outer="none")
    if values_body is not None and values.null_count == 0 and elem_dtype not in (
        DT_FIXED_BINARY, DT_DECIMAL64, DT_DECIMAL128,
    ):
        # the caller's winning trial body IS the values frame (string trial
        # reuse — the same pattern doc_id follows); excluded for types that
        # prepend a payload type header
        values_frame = wrap(
            strcodecs.STR_CODEC_IDS[values_codec], values_body, "none", elem_dtype
        )
    else:
        values_frame = encode_any_column(values, values_codec, outer="none")
    body = struct.pack("<I", len(lengths_frame)) + lengths_frame + values_frame
    cid = (
        strcodecs.STR_CODEC_IDS[values_codec]
        if values_codec in strcodecs.STR_CODEC_IDS
        else intcodecs.INT_CODEC_IDS[values_codec]
    )
    return wrap(cid, body, outer, elem_dtype, FLAG_LIST)


def _blocked_index(body: memoryview) -> tuple[int, int, np.ndarray, int]:
    """Parse a FLAG_BLOCKED body → (block_rows, nblocks, offsets, data_off)."""
    block_rows, nblocks = struct.unpack_from("<II", body, 0)
    offs = np.frombuffer(body, np.uint64, count=nblocks + 1, offset=8)
    return block_rows, nblocks, offs, 8 + (nblocks + 1) * 8


def _blocked_frames(body: memoryview):
    block_rows, nblocks, offs, base = _blocked_index(body)
    for i in range(nblocks):
        yield body[base + int(offs[i]) : base + int(offs[i + 1])]


def decode_list_rows(
    buf: bytes | memoryview, indices: np.ndarray
) -> tuple[pa.Array, int]:
    """Random-access decode of specific ROWS of a list column payload →
    (rows in ascending-index order, payload bytes actually decoded).

    On a FLAG_BLOCKED frame only the blocks covering `indices` are decoded
    — the R10 small-pages contract: a point lookup touches O(rows-wanted)
    bytes. Any other frame decodes fully and takes (byte count = whole
    payload), so callers need no format knowledge."""
    idx = np.sort(np.asarray(indices, np.int64))
    cid, body, dtype, flags = unwrap(buf)
    if not (flags & FLAG_BLOCKED):
        arr = decode_column_arrow(buf)
        return arr.take(pa.array(idx, pa.int64())), len(buf)
    block_rows, nblocks, offs, base = _blocked_index(body)
    parts = []
    touched = base + len(buf) - len(body)  # index + frame header bytes
    if len(idx) == 0:
        # a candidate chunk with no matching rows (bucket collision is the
        # COMMON lookup case): type the empty result off block 0 without
        # paying for the other blocks
        frame = body[base + int(offs[0]) : base + int(offs[1])]
        return decode_column_arrow(frame).slice(0, 0), touched + len(frame)
    for b in np.unique(idx // block_rows):
        frame = body[base + int(offs[b]) : base + int(offs[b + 1])]
        sub = decode_column_arrow(frame)
        local = idx[(idx >= b * block_rows) & (idx < (b + 1) * block_rows)] - b * block_rows
        parts.append(sub.take(pa.array(local, pa.int64())))
        touched += len(frame)
    return pa.concat_arrays(parts), touched


def _decode_list_body(body: memoryview, dtype: int) -> pa.Array:
    (llen,) = struct.unpack_from("<I", body, 0)
    lengths = decode_column_arrow(body[4 : 4 + llen])
    # container-level decode keeps the EXACT stored element type (scalar
    # parity); the Spark decode path narrows list children via
    # _narrow_interchange's list branch
    values = decode_column_arrow(body[4 + llen :])
    n = len(lengths)
    lens64 = np.asarray(pa.compute.fill_null(lengths, 0), dtype=np.int64)
    offsets64 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens64, out=offsets64[1:])
    if offsets64[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"list payload element count {offsets64[-1]} overflows int32 offsets"
        )
    offsets = offsets64.astype(np.int32)
    if lengths.null_count == 0:
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
    valid = np.asarray(lengths.is_valid())
    return pa.Array.from_buffers(
        pa.list_(values.type),
        n,
        [
            pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()),
            pa.py_buffer(offsets.tobytes()),
        ],
        children=[values],
    )


def _narrow_type(t: pa.DataType) -> pa.DataType:
    """The Spark-interchange type for a stored scalar type."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return pa.binary()
    if (pa.types.is_time64(t) and t.unit != "ns") or pa.types.is_time32(t):
        return pa.time64("ns")
    return t


def _narrow_interchange(arr: pa.Array) -> pa.Array:
    """Shape an array for Spark's Arrow interchange: large_string/
    large_binary → string/binary, fixed-size binary → binary, any non-ns
    TIME unit → time64[ns] (Spark's TIME(6) interchange type), and list
    arrays narrow their CHILD the same way — container-level decode keeps
    the exact stored type everywhere; only the Spark decode path narrows."""
    if pa.types.is_list(arr.type):
        child = _narrow_type(arr.type.value_type)
        return arr.cast(pa.list_(child)) if child != arr.type.value_type else arr
    target = _narrow_type(arr.type)
    return arr.cast(target) if target != arr.type else arr


def decode_column_arrow(buf: bytes | memoryview) -> pa.Array:
    """Decode any framed payload → arrow array of its logical type, nulls
    restored at their original positions. List payloads (FLAG_LIST) decode
    to pa.list_ arrays with int32 offsets — Spark's interchange shape."""
    cid, body, dtype, flags = unwrap(buf)
    if flags & FLAG_BLOCKED:
        parts = [decode_column_arrow(f) for f in _blocked_frames(body)]
        return pa.concat_arrays(parts)
    if flags & FLAG_LIST:
        return _decode_list_body(body, dtype)
    valid = None
    if flags & FLAG_NULLS:
        (n_total,) = struct.unpack_from("<I", body, 0)
        nbytes = (n_total + 7) // 8
        valid = np.unpackbits(
            np.frombuffer(body, np.uint8, count=nbytes, offset=4),
            bitorder="little", count=n_total,
        ).astype(bool)
        body = body[4 + nbytes :]
    if dtype == DT_DECIMAL128:
        p, s = body[0], body[1]
        (llen,) = struct.unpack_from("<I", body, 2)
        cid_lo, b_lo, _, _ = unwrap(body[6 : 6 + llen])
        cid_hi, b_hi, _, _ = unwrap(body[6 + llen :])
        lo = intcodecs.decode_int_body(cid_lo, b_lo, wide=True)
        hi = intcodecs.decode_int_body(cid_hi, b_hi, wide=True)
        if valid is None:
            pairs = np.empty((len(lo), 2), np.int64)
            pairs[:, 0], pairs[:, 1] = lo, hi
            return pa.Array.from_buffers(
                pa.decimal128(p, s), len(lo), [None, pa.py_buffer(pairs.tobytes())]
            )
        pairs = np.zeros((len(valid), 2), np.int64)
        pairs[valid, 0], pairs[valid, 1] = lo, hi
        return pa.Array.from_buffers(
            pa.decimal128(p, s),
            len(valid),
            [
                pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()),
                pa.py_buffer(pairs.tobytes()),
            ],
        )
    # parameterized-type headers (after the validity section, before the
    # codec body): decimal carries (precision, scale), fsb its byte width
    deci = fsb_width = None
    if dtype == DT_DECIMAL64:
        deci = (body[0], body[1])
        body = body[2:]
    elif dtype == DT_FIXED_BINARY:
        (fsb_width,) = struct.unpack_from("<I", body, 0)
        body = body[4:]
    if cid in strcodecs.STR_CODEC_NAMES:
        vals = strcodecs.decode_str_body(cid, body)
        if dtype in (DT_BINARY, DT_FIXED_BINARY):
            vals = vals.cast(pa.large_binary())

        def _shape(a: pa.Array) -> pa.Array:
            if dtype == DT_FIXED_BINARY:
                return a.cast(pa.binary()).cast(pa.binary(fsb_width))
            return a

        if valid is None:
            return _shape(vals)
        if len(vals) == 0:  # all-null column
            return pa.nulls(
                len(valid),
                pa.binary(fsb_width) if dtype == DT_FIXED_BINARY else vals.type,
            )
        # scatter valid strings back to their slots; null slots zero-length
        idx = np.full(len(valid), -1, np.int64)
        idx[valid] = np.arange(int(valid.sum()))
        taken = vals.take(pa.array(np.maximum(idx, 0), pa.int64()))
        mask = pa.array(valid, pa.bool_())
        return _shape(pa.compute.if_else(mask, taken, pa.scalar(None, taken.type)))
    vals = intcodecs.decode_int_body(cid, body, wide=is_wide(dtype))
    if valid is None:
        return _ints_to_arrow(vals, dtype, deci)
    full = np.zeros(len(valid), dtype=vals.dtype)
    full[valid] = vals
    dense = _ints_to_arrow(full, dtype, deci)
    mask = pa.array(valid, pa.bool_())
    return pa.compute.if_else(mask, dense, pa.scalar(None, dense.type))


def decode_column(buf: bytes | memoryview):
    """Canonical decode: np.int32/np.int64 array for null-free int-kind
    payloads (the hot token path), pa.Array otherwise."""
    cid, body, dtype, flags = unwrap(buf)
    if flags or is_string_kind(dtype) or dtype not in (DT_INT32, DT_INT64):
        # the raw-body shortcut must not skip DT_FIXED_BINARY's width header
        # NOR DT_BINARY's large_binary cast (a raw str body decodes to
        # large_string — arbitrary bytes would crash utf-8 consumers)
        if cid in strcodecs.STR_CODEC_NAMES and not flags and dtype == DT_STRING:
            return strcodecs.decode_str_body(cid, body)
        return decode_column_arrow(buf)
    return intcodecs.decode_int_body(cid, body, wide=is_wide(dtype))


def codec_of(buf: bytes | memoryview) -> tuple[str, str]:
    """(codec_name, outer_name) without decoding (v2 or v3 frame)."""
    mv = memoryview(buf)
    return CODEC_NAMES[mv[3]], OUTER_NAMES[mv[4]]


def dtype_of(buf: bytes | memoryview) -> int:
    """Logical dtype code without decoding (v3 header byte 6; v2 implies it
    from the codec family)."""
    mv = memoryview(buf)
    if mv[2] == _V2:
        return DT_STRING if mv[3] in strcodecs.STR_CODEC_NAMES else DT_INT32
    return mv[6]