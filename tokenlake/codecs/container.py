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

Layout: b"TL" | version u8 | codec_id u8 | outer_id u8 | level u8 |
        raw_len u32 (pre-outer body bytes) | payload
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from . import intcodecs, strcodecs

MAGIC = b"TL"
VERSION = 2

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

_HDR = struct.Struct("<2sBBBBI")


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


def wrap(codec_id: int, body: bytes, outer: str = "auto") -> bytes:
    """Frame a codec body, optionally outer-compressing it.

    outer: "auto" (R2/R3 policy), "none", or "<codec>[:level]" with codec in
    zlib/zstd/lz4/snappy/gzip/brotli.
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
        sample = body if len(body) <= _TRIAL_BYTES else body[-_TRIAL_BYTES:]
        if len(_outer_compress(name, level, sample)) < OUTER_KEEP_RATIO * len(sample):
            z = _outer_compress(name, level, body)
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
    return _HDR.pack(MAGIC, VERSION, codec_id, oid, level, len(body)) + payload


def unwrap(buf: bytes | memoryview) -> tuple[int, memoryview]:
    mv = memoryview(buf)
    magic, ver, codec_id, oid, _level, raw_len = _HDR.unpack_from(mv, 0)
    if magic != MAGIC or ver != VERSION:
        raise ValueError("bad container header")
    body = mv[_HDR.size :]
    if oid != OUTER_NONE:
        body = memoryview(_outer_decompress(OUTER_NAMES[oid], body, raw_len))
    # the header's raw_len is a validated integrity invariant: without it a
    # truncated outer-none payload would decode silently short (dec_plain
    # frombuffers whatever bytes remain)
    if len(body) != raw_len:
        raise ValueError(
            f"container body is {len(body)} B, header says {raw_len} B (truncated or corrupt)"
        )
    return codec_id, body


def encode_int_column(arr: np.ndarray, codec: str, outer: str = "auto") -> bytes:
    cid = intcodecs.INT_CODEC_IDS[codec]
    return wrap(cid, intcodecs.encode_int_body(cid, arr), outer)


def encode_str_column(values, codec: str, outer: str = "auto") -> bytes:
    cid = strcodecs.STR_CODEC_IDS[codec]
    return wrap(cid, strcodecs.encode_str_body(cid, values), outer)


def decode_column(buf: bytes | memoryview):
    """Decode any framed payload → np.int32 array or pa.Array of strings."""
    cid, body = unwrap(buf)
    if cid in intcodecs.INT_CODEC_NAMES:
        return intcodecs.decode_int_body(cid, body)
    return strcodecs.decode_str_body(cid, body)


def codec_of(buf: bytes | memoryview) -> tuple[str, str]:
    """(codec_name, outer_name) without decoding."""
    mv = memoryview(buf)
    return CODEC_NAMES[mv[3]], OUTER_NAMES[mv[4]]