"""String/binary-column codecs (doc_id, source, extras) — Arrow-vectorized,
no per-row Python.

Analog of the reference's BYTE_ARRAY handling: PLAIN with length prefixes
(DELTA_LENGTH_BYTE_ARRAY recommendation, reference
src/parquet-linter/src/rules/string_encoding.rs:57-188), dictionary
encoding for low-cardinality text (rules/dictionary_encoding.rs:312-477),
and front coding for sorted shared-prefix ids — the DELTA_BYTE_ARRAY analog
(prescription.rs:624-636 names it; doc_ids are `{source}-{counter:012d}`,
schema.py, so consecutive ids share almost everything).

Wire formats:
  str_plain : <I n> <I data_len> data for(lengths:int32)
  str_dict  : <I n> <I dict_buf_len> str_plain(unique) for-packed indices
  str_prefix: <I n> <I suffix_data_len> suffix_data for(prefix_lens:int32)
              for(suffix_lens:int32)

Nulls never reach these encoders: the container layer (encode_any_column)
strips them behind its validity bitmap first.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .bitio import pack_uints, unpack_uints, width_for, ragged_arange
from .intcodecs import dec_for, enc_for

STR_PLAIN, STR_DICT, STR_PREFIX = 16, 17, 18
STR_CODEC_NAMES = {STR_PLAIN: "str_plain", STR_DICT: "str_dict", STR_PREFIX: "str_prefix"}
STR_CODEC_IDS = {v: k for k, v in STR_CODEC_NAMES.items()}

_U32 = struct.Struct("<I")

# front-coding prefix cap: bounds the decoder's per-character-position loop
# (≤255 vectorized passes) and fits the donor-chain argument below; ids and
# URLs share far fewer than 255 leading bytes in practice
PREFIX_CAP = 255


def _to_arrow(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(values, type=pa.large_string())
    if arr.null_count:
        raise ValueError("null strings must be stripped by the container layer first")
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        return arr.cast(pa.large_binary())
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
    indices = d.indices.to_numpy(zero_copy_only=False)
    dict_buf = enc_str_plain(d.dictionary)
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


def _offsets_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(absolute int64 offsets[n+1], data bytes as uint8 array) of a
    large_string/large_binary array."""
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8
    )
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8, count=int(offsets[-1]))
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    return offsets, data


def _cumsum0(lens: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out[1:])
    return out


def enc_str_prefix(values) -> bytes:
    """Front coding: each string stores (shared-prefix-length vs its
    predecessor, suffix bytes). On the chunk's sorted doc_ids
    (`{source}-{counter:012d}`) the suffix is a handful of digits — several-
    fold smaller than str_plain before the outer layer even runs.

    The pairwise common-prefix lengths are computed in ONE vectorized pass:
    gather both rows' overlapping bytes, mark equality, and count each
    segment's leading-equal run via a cumulative-mismatch reduceat — no
    per-row Python."""
    arr = _to_arrow(values)
    n = len(arr)
    offsets, data = _offsets_data(arr)
    lens = np.diff(offsets)
    plen = np.zeros(n, dtype=np.int64)
    if n > 1:
        L = np.minimum(np.minimum(lens[1:], lens[:-1]), PREFIX_CAP)
        total = int(L.sum())
        if total:
    
            rag = ragged_arange(L)
            cur = data[np.repeat(offsets[1:n], L) + rag]
            prev = data[np.repeat(offsets[: n - 1], L) + rag]
            eq = cur == prev
            mis = ~eq
            gc = np.cumsum(mis)
            seg_starts = _cumsum0(L)[:-1]
            nonzero = L > 0
            base = np.zeros(n - 1, dtype=np.int64)
            sstarts = np.minimum(seg_starts, total - 1)
            base[nonzero] = (gc[sstarts] - mis[sstarts])[nonzero]
            hit = (eq & (gc == np.repeat(base, L))).astype(np.int64)
            # reduceat at the UNCLAMPED starts over a sentinel-padded hit:
            # clamping a trailing zero-length segment's start to total-1 would
            # shorten the preceding segment's range and undercount its run by
            # one byte (round-4 advice); the sentinel 0 keeps index `total`
            # valid and adds nothing to the last real segment's sum
            counts = np.add.reduceat(np.append(hit, 0), seg_starts)
            counts[~nonzero] = 0
            plen[1:] = counts
    slen = lens - plen
    # gather the suffix bytes (tail of each string past its shared prefix)

    sidx = np.repeat(offsets[:-1] + plen, slen) + ragged_arange(slen)
    suffix = np.ascontiguousarray(data[sidx]).tobytes() if n else b""
    return (
        _U32.pack(n)
        + _U32.pack(len(suffix))
        + suffix
        + _U32.pack(0)  # reserved
        + _len_block(plen)
        + _len_block(slen)
    )


def _len_block(lens: np.ndarray) -> bytes:
    buf = enc_for(lens.astype(np.int32))
    return _U32.pack(len(buf)) + buf


def dec_str_prefix(body: memoryview) -> pa.Array:
    """Decode front coding with NO sequential dependence: char k of row i
    lives in the suffix of its *donor* — the most recent row j ≤ i with
    prefix_len[j] ≤ k (row 0 has prefix_len 0, so a donor always exists; the
    donor chain argument guarantees k < len[j]). One forward-fill + one
    gather per character position, ≤PREFIX_CAP+max_suffix positions total —
    loops over string length, never over rows."""
    (n,) = _U32.unpack_from(body, 0)
    (dlen,) = _U32.unpack_from(body, 4)
    suffix = np.frombuffer(body, dtype=np.uint8, count=dlen, offset=8)
    pos = 8 + dlen + 4
    (pblen,) = _U32.unpack_from(body, pos)
    plen = dec_for(body[pos + 4 : pos + 4 + pblen]).astype(np.int64)
    pos += 4 + pblen
    (sblen,) = _U32.unpack_from(body, pos)
    slen = dec_for(body[pos + 4 : pos + 4 + sblen]).astype(np.int64)
    lens = plen + slen
    ooff = _cumsum0(lens)
    soff = _cumsum0(slen)
    out = np.empty(int(ooff[-1]), dtype=np.uint8)
    if n:
        rows = np.arange(n, dtype=np.int64)
        max_plen = int(plen.max()) if len(plen) else 0
        # positions ≥ every prefix cap: bulk-copy each row's own suffix tail

        tail = ragged_arange(slen)
        out[np.repeat(ooff[:-1] + plen, slen) + tail] = suffix[
            np.repeat(soff[:-1], slen) + tail
        ]
        # positions inside some prefix: resolve via donor forward-fill, one
        # vectorized pass per character position k < max_plen
        for k in range(max_plen):
            alive = lens > k
            own = plen <= k
            donor = np.where(own, rows, -1)
            np.maximum.accumulate(donor, out=donor)
            need = alive & ~own
            if not need.any():
                continue
            d = donor[need]
            out[ooff[:-1][need] + k] = suffix[soff[d] + k - plen[d]]
    return pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(ooff.tobytes()), pa.py_buffer(out.tobytes())],
    )


_ENCODERS = {STR_PLAIN: enc_str_plain, STR_DICT: enc_str_dict, STR_PREFIX: enc_str_prefix}
_DECODERS = {STR_PLAIN: dec_str_plain, STR_DICT: dec_str_dict, STR_PREFIX: dec_str_prefix}


def encode_str_body(codec_id: int, values) -> bytes:
    return _ENCODERS[codec_id](values)


def decode_str_body(codec_id: int, body: memoryview) -> pa.Array:
    return _DECODERS[codec_id](body)
