"""String-column codecs (doc_id, source) — Arrow-vectorized, no per-row Python.

Analog of the reference's BYTE_ARRAY handling: PLAIN with length prefixes
(DELTA_LENGTH_BYTE_ARRAY recommendation, reference
src/parquet-linter/src/rules/string_encoding.rs:57-188) and dictionary
encoding for low-cardinality text (rules/dictionary_encoding.rs:312-477).

Wire formats:
  str_plain: <I n> <I data_len> data_utf8 for(lengths:int32)
  str_dict : <I n> <I dict_buf_len> str_plain(unique) for-packed indices
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .bitio import pack_uints, unpack_uints, width_for
from .intcodecs import dec_for, enc_for

STR_PLAIN, STR_DICT = 16, 17
STR_CODEC_NAMES = {STR_PLAIN: "str_plain", STR_DICT: "str_dict"}
STR_CODEC_IDS = {v: k for k, v in STR_CODEC_NAMES.items()}

_U32 = struct.Struct("<I")


def _to_arrow(values) -> pa.Array:
    if isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(values, type=pa.large_string())
    if arr.null_count:
        raise ValueError("null strings not supported (input schema is non-nullable)")
    return arr.cast(pa.large_string())


def enc_str_plain(values) -> bytes:
    arr = _to_arrow(values)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data_buf = arr.buffers()[2]
    data = bytes(data_buf)[offsets[0] : offsets[-1]] if data_buf is not None else b""
    lengths = np.diff(offsets).astype(np.int32)
    lbuf = enc_for(lengths)
    return _U32.pack(len(arr)) + _U32.pack(len(data)) + data + lbuf


def dec_str_plain(body: memoryview) -> pa.Array:
    (n,) = _U32.unpack_from(body, 0)
    (dlen,) = _U32.unpack_from(body, 4)
    data = bytes(body[8 : 8 + dlen])
    lengths = dec_for(body[8 + dlen :]).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.large_string(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )


def enc_str_dict(values) -> bytes:
    arr = _to_arrow(values)
    d = arr.dictionary_encode()
    indices = d.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dict_buf = enc_str_plain(d.dictionary.cast(pa.large_string()))
    ndv = len(d.dictionary)
    w = width_for(ndv - 1) if ndv > 1 else 0
    return (
        _U32.pack(len(arr))
        + _U32.pack(len(dict_buf))
        + dict_buf
        + bytes([w])
        + pack_uints(indices, w)
    )


def dec_str_dict(body: memoryview) -> pa.Array:
    (n,) = _U32.unpack_from(body, 0)
    (dlen,) = _U32.unpack_from(body, 4)
    dictionary = dec_str_plain(body[8 : 8 + dlen])
    w = body[8 + dlen]
    idx = unpack_uints(bytes(body[9 + dlen :]), n, w).astype(np.int32)
    return pa.DictionaryArray.from_arrays(pa.array(idx, type=pa.int32()), dictionary).cast(
        pa.large_string()
    )


_ENCODERS = {STR_PLAIN: enc_str_plain, STR_DICT: enc_str_dict}
_DECODERS = {STR_PLAIN: dec_str_plain, STR_DICT: dec_str_dict}


def encode_str_body(codec_id: int, values) -> bytes:
    return _ENCODERS[codec_id](values)


def decode_str_body(codec_id: int, body: memoryview) -> pa.Array:
    return _DECODERS[codec_id](body)
