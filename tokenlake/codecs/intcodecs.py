"""Lightweight integer codecs over flat int32 token streams (pure numpy).

These are the encode-side realizations of the encodings the reference linter
*recommends* through its rules (it never encodes itself — it sets arrow-rs
WriterProperties, reference src/parquet-linter/src/fix.rs:213-234):

- plain           ↔ Encoding::PLAIN
- bitpack / for   ↔ frame-of-reference + bit-packing (the INT32 range analysis
                    in src/parquet-linter/src/column_context.rs:402-438 feeds it)
- delta           ↔ DELTA_BINARY_PACKED (rules/timestamp_encoding.rs:66-87)
- rle             ↔ RLE run-length (Parquet RLE/bit-packed hybrid analog)
- dict            ↔ dictionary encoding (rules/dictionary_encoding.rs:312-477)
- fsst            ↔ symbol-table compression over token n-grams — the analog of
                    the string-encoding rule's "text with exploitable structure"
                    path (rules/string_encoding.rs:57-188), realized as a
                    RePair-style digram grammar over the token alphabet.

Every body is self-describing: ``decode(codec_id, body)`` needs no side
channel. All loops are over bit positions, runs-of-symbols, or table entries —
never over data values (north_rule: no per-row Python).
"""

from __future__ import annotations

import struct

import numpy as np

from .bitio import (
    pack_uints,
    sorted_factorize,
    unpack_uints,
    width_for,
    zigzag_decode,
    zigzag_encode,
)

# codec ids (container header byte)
PLAIN, FOR, DELTA, RLE, DICT, FSST = 0, 1, 2, 3, 4, 5

INT_CODEC_NAMES = {PLAIN: "plain", FOR: "for", DELTA: "delta", RLE: "rle", DICT: "dict", FSST: "fsst"}
INT_CODEC_IDS = {v: k for k, v in INT_CODEC_NAMES.items()}
# accepted aliases: "bitpack" is FOR with ref=min (identical wire format)
INT_CODEC_IDS["bitpack"] = FOR

_U32 = struct.Struct("<I")
_I64 = struct.Struct("<q")


def _as_i64(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.int64)


# ---------------------------------------------------------------- plain

def enc_plain(arr: np.ndarray) -> bytes:
    return _U32.pack(len(arr)) + np.ascontiguousarray(arr, dtype="<i4").tobytes()


def dec_plain(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    return np.frombuffer(body, dtype="<i4", count=n, offset=4).astype(np.int32, copy=False)


# ---------------------------------------------------------------- frame-of-reference (+ pure bitpack)

def enc_for(arr: np.ndarray) -> bytes:
    """FOR: subtract min, bit-pack the non-negative deltas."""
    n = len(arr)
    if n == 0:
        return _U32.pack(0) + _I64.pack(0) + b"\x00"
    a = _as_i64(arr)
    ref = int(a.min())
    deltas = (a - ref).astype(np.uint64)
    w = width_for(int(deltas.max()))
    return _U32.pack(n) + _I64.pack(ref) + bytes([w]) + pack_uints(deltas, w)


def dec_for(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (ref,) = _I64.unpack_from(body, 4)
    w = body[12]
    deltas = unpack_uints(bytes(body[13:]), n, w)
    return (deltas.astype(np.int64) + ref).astype(np.int32)


# ---------------------------------------------------------------- delta (DELTA_BINARY_PACKED analog)

_DELTA_BLOCK = 128  # values per miniblock (Parquet DELTA_BINARY_PACKED style)


def enc_delta(arr: np.ndarray) -> bytes:
    """Miniblock delta: zigzag diffs, per-128-value-block bit widths.

    Per-block widths keep occasional large deltas (per-row timestamp resets,
    outliers) from inflating the whole stream — same robustness argument as
    Parquet's DELTA_BINARY_PACKED miniblocks the reference recommends
    (rules/timestamp_encoding.rs:66-87). Blocks are packed grouped-by-width so
    the number of numpy calls is O(distinct widths ≤ 33), not O(blocks).
    """
    n = len(arr)
    if n == 0:
        return _U32.pack(0) + _I64.pack(0) + _U32.pack(0)
    a = _as_i64(arr)
    first = int(a[0])
    zz = zigzag_encode(np.diff(a))
    m = len(zz)
    nblocks = (m + _DELTA_BLOCK - 1) // _DELTA_BLOCK
    pad = nblocks * _DELTA_BLOCK - m
    zzp = np.pad(zz, (0, pad)).reshape(nblocks, _DELTA_BLOCK) if nblocks else zz.reshape(0, _DELTA_BLOCK)
    maxes = zzp.max(axis=1) if nblocks else np.empty(0, np.uint64)
    widths = np.zeros(nblocks, dtype=np.uint8)
    nz = maxes > 0
    if nz.any():
        widths[nz] = np.floor(np.log2(maxes[nz].astype(np.float64))).astype(np.uint8) + 1
        # float log2 can undershoot near powers of two — correct upward
        bad = (maxes >> widths.astype(np.uint64)) > 0
        widths[bad] += 1
    parts = [_U32.pack(n), _I64.pack(first), _U32.pack(nblocks), widths.tobytes()]
    for w in np.unique(widths):
        if w == 0:
            continue
        blocks = zzp[widths == w].ravel()
        parts.append(pack_uints(blocks, int(w)))
    return b"".join(parts)


def dec_delta(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    (first,) = _I64.unpack_from(body, 4)
    (nblocks,) = _U32.unpack_from(body, 12)
    widths = np.frombuffer(body, dtype=np.uint8, count=nblocks, offset=16)
    pos = 16 + nblocks
    m = n - 1
    zzp = np.zeros((nblocks, _DELTA_BLOCK), dtype=np.uint64)
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = widths == w
        cnt = int(sel.sum()) * _DELTA_BLOCK
        nbytes = (cnt * int(w) + 7) // 8
        zzp[sel] = unpack_uints(body[pos : pos + nbytes], cnt, int(w)).reshape(-1, _DELTA_BLOCK)
        pos += nbytes
    zz = zzp.ravel()[:m]
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        np.cumsum(zigzag_decode(zz), out=out[1:])
        out[1:] += first
    return out.astype(np.int32)


# ---------------------------------------------------------------- run-length

def run_starts(a: np.ndarray) -> np.ndarray:
    """Indices where a new run begins (vectorized)."""
    if len(a) == 0:
        return np.empty(0, dtype=np.int64)
    return np.r_[0, np.flatnonzero(a[1:] != a[:-1]) + 1].astype(np.int64)


def enc_rle(arr: np.ndarray) -> bytes:
    n = len(arr)
    starts = run_starts(arr)
    values = arr[starts] if n else np.empty(0, dtype=np.int32)
    lengths = (np.diff(np.r_[starts, n]) if n else np.empty(0, dtype=np.int64)).astype(np.int32)
    vbuf = enc_for(values)
    lbuf = enc_for(lengths)
    return _U32.pack(n) + _U32.pack(len(vbuf)) + vbuf + lbuf


def dec_rle(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (vlen,) = _U32.unpack_from(body, 4)
    values = dec_for(body[8 : 8 + vlen])
    lengths = dec_for(body[8 + vlen :])
    return np.repeat(values, lengths.astype(np.int64))


# ---------------------------------------------------------------- dictionary

def enc_dict(arr: np.ndarray) -> bytes:
    n = len(arr)
    if n == 0:
        vbuf = enc_delta(np.empty(0, dtype=np.int32))
        return _U32.pack(0) + _U32.pack(len(vbuf)) + vbuf + b"\x00"
    vals, inv = sorted_factorize(arr)
    # unique values are sorted → delta-pack the dictionary itself
    vbuf = enc_delta(vals.astype(np.int32))
    w = width_for(len(vals) - 1)
    return _U32.pack(n) + _U32.pack(len(vbuf)) + vbuf + bytes([w]) + pack_uints(inv.astype(np.uint64), w)


def dec_dict(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (vlen,) = _U32.unpack_from(body, 4)
    vals = dec_delta(body[8 : 8 + vlen])
    w = body[8 + vlen]
    idx = unpack_uints(bytes(body[9 + vlen :]), n, w).astype(np.int64)
    return vals[idx] if n else np.empty(0, dtype=np.int32)


# ---------------------------------------------------------------- FSST over token n-grams (RePair-style)

_FSST_MAX_SYMBOLS = 255      # new composite symbols budget (mirrors FSST's 255-entry table)
_FSST_ROUNDS = 8             # pairing rounds → captures n-grams up to 2**rounds tokens
_FSST_MIN_COUNT = 4          # a digram must appear this often to earn a symbol


def enc_fsst(arr: np.ndarray) -> bytes:
    """Symbol-table compression: dictionary-map tokens, then RePair digram rounds.

    Each round finds the most frequent adjacent symbol pairs, assigns them new
    symbol ids, and replaces non-overlapping occurrences (greedy left-to-right,
    resolved vectorized via run-parity). Composite symbols therefore expand to
    token n-grams of length up to 2**rounds — the "frequent phrase" structure
    the ngram fixture profile carries (FIXTURES.md §1).
    """
    n = len(arr)
    if n == 0:
        empty = enc_delta(np.empty(0, dtype=np.int32))
        return (
            _U32.pack(0) + _U32.pack(len(empty)) + empty
            + struct.pack("<H", 0) + b"\x00"  # npairs, pair width
            + _U32.pack(0) + b"\x00"          # stream len, stream width
        )
    base_vals, stream = sorted_factorize(arr)
    stream = stream.astype(np.int64)
    base = len(base_vals)
    nsym = base
    pair_left: list[int] = []
    pair_right: list[int] = []
    budget = _FSST_MAX_SYMBOLS
    for _ in range(_FSST_ROUNDS):
        if budget <= 0 or len(stream) < 2 or nsym > (1 << 31):
            break
        K = np.int64(nsym)
        ph = stream[:-1] * K + stream[1:]
        uniq, counts = np.unique(ph, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        take = order[: min(budget, 64)]
        take = take[counts[take] >= _FSST_MIN_COUNT]
        if len(take) == 0:
            break
        chosen = np.sort(uniq[take])
        # candidate positions: start of a chosen pair
        cand = np.isin(ph, chosen)
        if not cand.any():
            break
        # greedy non-overlap: within each run of consecutive candidate
        # positions keep even offsets (== left-to-right greedy), vectorized
        idx = np.flatnonzero(cand)
        gaps = np.diff(idx) > 1
        run_id = np.r_[0, np.cumsum(gaps)]
        run_first = idx[np.r_[0, np.flatnonzero(gaps) + 1]]
        offset_in_run = idx - run_first[run_id]
        keep = idx[offset_in_run % 2 == 0]
        if len(keep) == 0:
            break
        # assign symbol ids to the chosen pairs in sorted-hash order
        sym_of = np.searchsorted(chosen, ph[keep]) + nsym
        pair_left.extend((chosen // K).astype(np.int64).tolist())
        pair_right.extend((chosen % K).astype(np.int64).tolist())
        new_stream = stream.copy()
        new_stream[keep] = sym_of
        drop = np.zeros(len(stream), dtype=bool)
        drop[keep + 1] = True
        stream = new_stream[~drop]
        nsym += len(chosen)
        budget -= len(chosen)
    vbuf = enc_delta(base_vals.astype(np.int32))
    npairs = len(pair_left)
    pw = width_for(nsym - 1) if nsym > 1 else 0
    sw = width_for(nsym - 1) if nsym > 1 else 0
    out = [
        _U32.pack(n),
        _U32.pack(len(vbuf)),
        vbuf,
        struct.pack("<H", npairs),
        bytes([pw]),
        pack_uints(np.asarray(pair_left, dtype=np.uint64), pw),
        pack_uints(np.asarray(pair_right, dtype=np.uint64), pw),
        _U32.pack(len(stream)),
        bytes([sw]),
        pack_uints(stream.astype(np.uint64), sw),
    ]
    return b"".join(out)


def dec_fsst(body: memoryview) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (vlen,) = _U32.unpack_from(body, 4)
    base_vals = dec_delta(body[8 : 8 + vlen]).astype(np.int64)
    pos = 8 + vlen
    (npairs,) = struct.unpack_from("<H", body, pos)
    pos += 2
    pw = body[pos]
    pos += 1
    # pack_uints block layout: npairs ≤ 255 < BLOCK → single block, byte-rounded
    pb = (npairs * pw + 7) // 8
    left = unpack_uints(bytes(body[pos : pos + pb]), npairs, pw).astype(np.int64)
    pos += pb
    right = unpack_uints(bytes(body[pos : pos + pb]), npairs, pw).astype(np.int64)
    pos += pb
    (slen,) = _U32.unpack_from(body, pos)
    pos += 4
    sw = body[pos]
    pos += 1
    stream = unpack_uints(bytes(body[pos:]), slen, sw).astype(np.int64)
    base = len(base_vals)
    nsym = base + npairs
    # expansion lengths per symbol (composite symbols reference lower ids only)
    exp_len = np.ones(nsym, dtype=np.int64)
    for i in range(npairs):
        s = base + i
        exp_len[s] = exp_len[left[i]] + exp_len[right[i]]
    # full expansions, built bottom-up (≤255 table entries → tiny python loop)
    expansions: list[np.ndarray] = []
    def expand(sym: int) -> np.ndarray:
        if sym < base:
            return base_vals[sym : sym + 1]
        return expansions[sym - base]
    for i in range(npairs):
        expansions.append(np.concatenate([expand(int(left[i])), expand(int(right[i]))]))
    lens = exp_len[stream]
    offsets = np.r_[0, np.cumsum(lens)]
    out = np.empty(n, dtype=np.int64)
    # base symbols: single writes, vectorized
    is_base = stream < base
    out[offsets[:-1][is_base]] = base_vals[stream[is_base]]
    # composite symbols: one vectorized scatter per distinct composite symbol
    comp_syms = np.unique(stream[~is_base])
    for s in comp_syms:
        exp = expansions[int(s) - base]
        starts = offsets[:-1][stream == s]
        out[(starts[:, None] + np.arange(len(exp))).ravel()] = np.tile(exp, len(starts))
    return out.astype(np.int32)


# ---------------------------------------------------------------- dispatch

_ENCODERS = {PLAIN: enc_plain, FOR: enc_for, DELTA: enc_delta, RLE: enc_rle, DICT: enc_dict, FSST: enc_fsst}
_DECODERS = {PLAIN: dec_plain, FOR: dec_for, DELTA: dec_delta, RLE: dec_rle, DICT: dec_dict, FSST: dec_fsst}


def encode_int_body(codec_id: int, arr: np.ndarray) -> bytes:
    return _ENCODERS[codec_id](arr)


def decode_int_body(codec_id: int, body: memoryview) -> np.ndarray:
    return _DECODERS[codec_id](body)
