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
    packed_nbytes,
    ragged_arange,
    sorted_factorize,
    unpack_uints,
    width_for,
    zigzag_decode,
    zigzag_encode,
)

# codec ids (container header byte)
PLAIN, FOR, DELTA, RLE, DICT, FSST, BSS = 0, 1, 2, 3, 4, 5, 6

INT_CODEC_NAMES = {
    PLAIN: "plain", FOR: "for", DELTA: "delta", RLE: "rle",
    DICT: "dict", FSST: "fsst", BSS: "bss",
}
INT_CODEC_IDS = {v: k for k, v in INT_CODEC_NAMES.items()}
# accepted aliases: "bitpack" is FOR with ref=min (identical wire format)
INT_CODEC_IDS["bitpack"] = FOR

_U32 = struct.Struct("<I")
_I64 = struct.Struct("<q")


def _as_i64(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.int64)


# ---------------------------------------------------------------- plain

def enc_plain(arr: np.ndarray, wide: bool = False) -> bytes:
    dt = "<i8" if wide else "<i4"
    return _U32.pack(len(arr)) + np.ascontiguousarray(arr, dtype=dt).tobytes()


def dec_plain(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    dt, out = ("<i8", np.int64) if wide else ("<i4", np.int32)
    return np.frombuffer(body, dtype=dt, count=n, offset=4).astype(out, copy=False)


# ---------------------------------------------------------------- frame-of-reference (+ pure bitpack)

def enc_for(arr: np.ndarray) -> bytes:
    """FOR: subtract min, bit-pack the non-negative deltas.

    When the value range fits 32 bits the deltas are computed with uint32
    wraparound arithmetic (exact: true delta < 2**32), halving memory traffic —
    these kernels are bandwidth-bound when many chunks encode concurrently.
    """
    n = len(arr)
    if n == 0:
        return _U32.pack(0) + _I64.pack(0) + b"\x00"
    ref = int(arr.min())
    w = width_for(int(arr.max()) - ref)
    if w <= 32 and arr.dtype in (np.int32, np.uint32):
        deltas = arr.view(np.uint32) - np.uint32(ref & 0xFFFFFFFF)
    else:
        deltas = (_as_i64(arr) - ref).astype(np.uint64)
    return _U32.pack(n) + _I64.pack(ref) + bytes([w]) + pack_uints(deltas, w)


def dec_for(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (ref,) = _I64.unpack_from(body, 4)
    w = body[12]
    if w <= 32 and not wide:
        # uint32 wraparound add is exact: result is an in-range int32
        deltas = unpack_uints(bytes(body[13:]), n, w, dtype=np.uint32)
        return (deltas + np.uint32(ref & 0xFFFFFFFF)).view(np.int32)
    deltas = unpack_uints(bytes(body[13:]), n, w)
    # uint64 wraparound add is exact for 64-bit ranges: the stored delta is
    # the true difference mod 2**64, so adding ref mod 2**64 restores the
    # original bit pattern even when (max - min) exceeds int64
    out = (deltas + np.uint64(ref & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    return out if wide else out.astype(np.int32)


# ---------------------------------------------------------------- delta (DELTA_BINARY_PACKED analog)

_DELTA_BLOCK = 128  # values per miniblock (Parquet DELTA_BINARY_PACKED style)


def enc_delta(arr: np.ndarray) -> bytes:
    """Miniblock delta: zigzag diffs, per-128-value-block bit widths.

    Per-block widths keep occasional large deltas (per-row timestamp resets,
    outliers) from inflating the whole stream — same robustness argument as
    Parquet's DELTA_BINARY_PACKED miniblocks the reference recommends
    (rules/timestamp_encoding.rs:66-87). Blocks are packed grouped-by-width so
    the number of numpy calls is O(distinct widths ≤ 65), not O(blocks).

    int64 inputs are exact: diffs wrap mod 2**64 on encode and the decode
    cumsum wraps identically, so extreme ranges round-trip bit-identical.
    """
    n = len(arr)
    if n == 0:
        return _U32.pack(0) + _I64.pack(0) + _U32.pack(0)
    a = _as_i64(arr)
    first = int(a[0])
    with np.errstate(over="ignore"):
        zz = zigzag_encode(np.diff(a))
    m = len(zz)
    nblocks = (m + _DELTA_BLOCK - 1) // _DELTA_BLOCK
    pad = nblocks * _DELTA_BLOCK - m
    zzp = np.pad(zz, (0, pad)).reshape(nblocks, _DELTA_BLOCK) if nblocks else zz.reshape(0, _DELTA_BLOCK)
    maxes = zzp.max(axis=1) if nblocks else np.empty(0, np.uint64)
    widths = np.zeros(nblocks, dtype=np.uint8)
    nz = maxes > 0
    if nz.any():
        # float log2 rounds near powers of two; clamp to ≤64 BEFORE the
        # shift-based correction (a >>64 on uint64 is undefined), then
        # correct the remaining undershoots upward
        widths[nz] = np.minimum(
            np.floor(np.log2(maxes[nz].astype(np.float64))).astype(np.uint8) + 1, 64
        )
        lt64 = widths < 64
        bad = lt64 & ((maxes >> np.minimum(widths, 63).astype(np.uint64)) > 0)
        widths[bad] += 1
    parts = [_U32.pack(n), _I64.pack(first), _U32.pack(nblocks), widths.tobytes()]
    for w in np.unique(widths):
        if w == 0:
            continue
        blocks = zzp[widths == w].ravel()
        parts.append(pack_uints(blocks, int(w)))
    return b"".join(parts)


def dec_delta(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64 if wide else np.int32)
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
        nbytes = packed_nbytes(cnt, int(w))
        zzp[sel] = unpack_uints(body[pos : pos + nbytes], cnt, int(w)).reshape(-1, _DELTA_BLOCK)
        pos += nbytes
    zz = zzp.ravel()[:m]
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        with np.errstate(over="ignore"):
            np.cumsum(zigzag_decode(zz), out=out[1:])
            out[1:] += first
    return out if wide else out.astype(np.int32)


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


def dec_rle(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (vlen,) = _U32.unpack_from(body, 4)
    values = dec_for(body[8 : 8 + vlen], wide)
    lengths = dec_for(body[8 + vlen :])
    return np.repeat(values, lengths.astype(np.int64))


# ---------------------------------------------------------------- dictionary

def enc_dict(arr: np.ndarray, wide: bool = False, fact=None) -> bytes:
    """`fact`: optional precomputed (sorted_unique_values, codes) — the
    stats pass already factorized the stream when its sample saturated."""
    n = len(arr)
    if n == 0:
        vbuf = enc_delta(np.empty(0, dtype=np.int64 if wide else np.int32))
        return _U32.pack(0) + _U32.pack(len(vbuf)) + vbuf + b"\x00"
    vals, inv = fact if fact is not None else sorted_factorize(arr)
    # unique values are sorted → delta-pack the dictionary itself
    vbuf = enc_delta(vals if wide else vals.astype(np.int32))
    w = width_for(len(vals) - 1)
    # inv goes to pack_uints in its native narrow dtype — pack casts to the
    # carrier itself; a uint64 round-trip here would double the memory traffic
    return _U32.pack(n) + _U32.pack(len(vbuf)) + vbuf + bytes([w]) + pack_uints(inv, w)


def dec_dict(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    (vlen,) = _U32.unpack_from(body, 4)
    vals = dec_delta(body[8 : 8 + vlen], wide)
    w = body[8 + vlen]
    # unpack straight to intp: fancy indexing converts narrower index arrays
    # to intp internally anyway (an extra n-element copy) — widening once in
    # the unpack astype skips that hidden pass
    idx = unpack_uints(bytes(body[9 + vlen :]), n, w, dtype=np.intp)
    return vals[idx] if n else np.empty(0, dtype=np.int64 if wide else np.int32)


# ---------------------------------------------------------------- byte-stream-split

def enc_bss(arr: np.ndarray, wide: bool = False) -> bytes:
    """BYTE_STREAM_SPLIT (reference rules/float_encoding.rs:17-90): transpose
    the element bytes so all 0th bytes are contiguous, then all 1st bytes, …
    The transposed layout is what the OUTER general-purpose codec exploits —
    float32 sign/exponent bytes cluster tightly while mantissa bytes stay
    noisy, giving the reference's claimed 2-4× when zstd runs on top. The
    body itself is exactly plain-size; selection must pair it with an outer.

    The transpose is one strided numpy copy per byte plane (≤8 planes), never
    a per-value loop. Works on any fixed-width element handed over as its
    int bit-pattern view (float32→int32, float64→int64)."""
    n = len(arr)
    size = 8 if wide else 4
    a = np.ascontiguousarray(arr, dtype="<i8" if wide else "<i4")
    planes = a.view(np.uint8).reshape(n, size).T if n else np.empty((size, 0), np.uint8)
    return _U32.pack(n) + bytes([size]) + b"".join(
        np.ascontiguousarray(planes[b]).tobytes() for b in range(size)
    )


def dec_bss(body: memoryview, wide: bool = False) -> np.ndarray:
    (n,) = _U32.unpack_from(body, 0)
    size = body[4]
    raw = np.frombuffer(body, dtype=np.uint8, count=n * size, offset=5)
    out = np.empty((n, size), dtype=np.uint8)
    for b in range(size):
        out[:, b] = raw[b * n : (b + 1) * n]
    return out.ravel().view("<i8" if size == 8 else "<i4").astype(
        np.int64 if wide else np.int32, copy=False
    )


# ---------------------------------------------------------------- FSST over token n-grams (RePair-style)

_FSST_MAX_SYMBOLS = 1 << 13  # composite-symbol budget; table cost is ~2*pw bits
                             # per entry so even 8 Ki entries is a few KB
_FSST_PER_ROUND = 1 << 12    # new symbols per round
_FSST_ROUNDS = 8             # pairing rounds → captures n-grams up to 2**rounds tokens
_FSST_MIN_COUNT = 4          # a digram must appear this often (in the sample) to earn a symbol
_FSST_SAMPLE = 1 << 19       # symbols examined to pick each round's pair table
                             # (sampled cost estimation, reference SAMPLE_ROWS analog)


def _dedup_by_hash(chosen: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Pick a power-of-two LUT size and drop pairs whose low bits collide.

    Dropping a colliding pair only costs a sliver of compression (it just isn't
    replaced this round); it buys an exact one-gather membership test. Returns
    (kept_chosen_sorted, lut, mask)."""
    m = 1 << max(16, (len(chosen) * 16 - 1).bit_length())
    m = min(m, 1 << 22)
    h = (chosen & (m - 1)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    first = np.r_[True, hs[1:] != hs[:-1]]
    kept = np.sort(chosen[order[first]])
    lut = np.full(m, -1, np.int32)
    lut[kept & (m - 1)] = np.arange(len(kept), dtype=np.int32)
    return kept, lut, m - 1


def _pair_membership(stream: np.ndarray, K: int, chosen: np.ndarray, lut: np.ndarray, mask: int):
    """(verified candidate POSITIONS, chosen_index) without materializing a
    full int64 pair-hash stream: the LUT index needs only `(s1*K + s2) mod
    2^k`, which uint32 wraparound arithmetic computes exactly (mod 2^32
    preserves all low bits), so the full-width stream stays 4 B/position;
    the exact 64-bit pair key is computed ONLY at probable-hit positions
    for the collision verify. Returning the index list directly lets the
    greedy step skip a second full-width mask scan."""
    s1 = stream[:-1].view(np.uint32)
    s2 = stream[1:].view(np.uint32)
    # stays uint32 end-to-end: numpy indexes with unsigned ints directly,
    # and widening the probe stream to int64 would re-add the 8 B/position
    # pass this path exists to avoid
    phm = (s1 * np.uint32(K & 0xFFFFFFFF) + s2) & np.uint32(mask)
    ci = lut[phm]
    pos = np.flatnonzero(ci >= 0)
    if len(pos):
        ph_exact = stream[pos].astype(np.int64) * np.int64(K) + stream[pos + 1]
        pos = pos[chosen[ci[pos]] == ph_exact]
    return pos, ci


def _greedy_nonoverlap(idx: np.ndarray) -> np.ndarray:
    """Left-to-right greedy over overlapping candidate pair starts: inside
    each run of consecutive candidates keep even offsets.

    Takes the sorted candidate POSITION list directly (the membership pass
    already produced it — no second full-width mask scan); every op here is
    O(m), and candidates are typically a small fraction of the stream."""
    m = len(idx)
    if m == 0:
        return idx
    # run start per candidate: forward-fill idx over breaks in consecutiveness
    brk = np.empty(m, dtype=bool)
    brk[0] = True
    np.not_equal(np.diff(idx), 1, out=brk[1:])
    run_start = np.where(brk, idx, 0)
    np.maximum.accumulate(run_start, out=run_start)
    return idx[((idx - run_start) & 1) == 0]


def enc_fsst(arr: np.ndarray, fact=None) -> bytes:
    """Symbol-table compression: dictionary-map tokens, then RePair digram rounds.

    Each round picks the most frequent adjacent symbol pairs *from a bounded
    head sample* (the reference's 16 Ki-row sampling discipline,
    cardinality.rs:29 — counting pairs over the full stream would make encode
    O(rounds × n log n)), assigns them new symbol ids, and replaces
    non-overlapping occurrences across the full stream (greedy left-to-right,
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
    # `fact`: optional precomputed (sorted_unique_values, codes) from the
    # stats pass — one full-stream hash pass saved when the exact-NDV
    # resolve already ran. The astype below always copies (factorize codes
    # come back unsigned), so the cached codes are never mutated in place.
    base_vals, stream = fact if fact is not None else sorted_factorize(arr)
    # symbols stay int32 (nsym < 2**30 guard below); only the pair hash needs
    # 64 bits — the round loop is bandwidth-bound, so stream bytes = cost
    stream = stream.astype(np.int32)
    base = len(base_vals)
    nsym = base
    pair_left: list[np.ndarray] = []
    pair_right: list[np.ndarray] = []
    budget = _FSST_MAX_SYMBOLS
    for _ in range(_FSST_ROUNDS):
        if budget <= 0 or len(stream) < 2 or nsym > (1 << 30):
            break
        K = np.int64(nsym)
        # exact 64-bit pair keys only for the bounded head sample (pair
        # selection); the full stream is probed via the uint32 low-bit path
        # inside _pair_membership
        samp = stream[: _FSST_SAMPLE]
        # force int64 BEFORE the multiply: numpy 1.x value-based promotion
        # keeps int32_array * int64_scalar in int32, so pair keys wrapped
        # for nsym > ~46341 and the exact verify below rejected every pair
        # — silently disabling fsst for realistic (50K-200K) vocabularies
        ph_s = samp[:-1].astype(np.int64) * K + samp[1:]
        uniq, counts = np.unique(ph_s, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        take = order[: min(budget, _FSST_PER_ROUND)]
        take = take[counts[take] >= _FSST_MIN_COUNT]
        if len(take) == 0:
            break
        chosen, lut, mask = _dedup_by_hash(uniq[take])
        idx, ci = _pair_membership(stream, int(K), chosen, lut, mask)
        if len(idx) == 0:
            break
        keep = _greedy_nonoverlap(idx)
        # stop when a round stops paying: <2% of positions replaced
        if len(keep) < max(1, len(stream) // 50):
            break
        # symbol id of each chosen pair = its rank in the sorted chosen array
        stream[keep] = ci[keep] + np.int32(nsym)
        pair_left.append((chosen // K).astype(np.int64))
        pair_right.append((chosen % K).astype(np.int64))
        drop = np.zeros(len(stream), dtype=bool)
        drop[keep + 1] = True
        stream = stream[~drop]
        nsym += len(chosen)
        budget -= len(chosen)
    vbuf = enc_delta(base_vals.astype(np.int32))
    lefts = np.concatenate(pair_left) if pair_left else np.empty(0, np.int64)
    rights = np.concatenate(pair_right) if pair_right else np.empty(0, np.int64)
    npairs = len(lefts)
    pw = width_for(nsym - 1) if nsym > 1 else 0
    sw = width_for(nsym - 1) if nsym > 1 else 0
    out = [
        _U32.pack(n),
        _U32.pack(len(vbuf)),
        vbuf,
        struct.pack("<H", npairs),
        bytes([pw]),
        pack_uints(lefts, pw),
        pack_uints(rights, pw),
        _U32.pack(len(stream)),
        bytes([sw]),
        pack_uints(stream, sw),
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
    pb = packed_nbytes(npairs, pw)
    left = unpack_uints(bytes(body[pos : pos + pb]), npairs, pw).astype(np.int64)
    pos += pb
    right = unpack_uints(bytes(body[pos : pos + pb]), npairs, pw).astype(np.int64)
    pos += pb
    (slen,) = _U32.unpack_from(body, pos)
    pos += 4
    sw = body[pos]
    pos += 1
    # stream indexes stay intp-wide (int64): numpy fancy indexing converts any
    # narrower index array to intp internally (a hidden n-element copy), so
    # int64 here IS the zero-conversion path for every gather below
    stream = unpack_uints(bytes(body[pos:]), slen, sw).astype(np.int64)
    base = len(base_vals)
    nsym = base + npairs
    # symbol heap: concatenated full expansions of every symbol. Base symbols
    # are singles at offsets 0..base-1; each composite's expansion is built
    # bottom-up from two earlier heap slices (≤255 table entries → tiny loop
    # over table size, never over data values).
    exp_len = np.ones(nsym, dtype=np.int64)
    for i in range(npairs):
        exp_len[base + i] = exp_len[left[i]] + exp_len[right[i]]
    heap_off = np.zeros(nsym + 1, dtype=np.int64)
    np.cumsum(exp_len, out=heap_off[1:])
    # heap holds token VALUES (int32 by contract): an int32 heap makes the
    # final expansion gather emit int32 directly — the old int64 heap +
    # trailing astype moved 12 extra bytes per output token
    heap = np.empty(int(heap_off[-1]), dtype=np.int32)
    heap[:base] = base_vals.astype(np.int32)
    for i in range(npairs):
        s = base + i
        o = int(heap_off[s])
        l, r = int(left[i]), int(right[i])
        ll = int(exp_len[l])
        heap[o : o + ll] = heap[heap_off[l] : heap_off[l] + ll]
        heap[o + ll : o + int(exp_len[s])] = heap[heap_off[r] : heap_off[r] + int(exp_len[r])]
    # one gather expands the whole stream: out[i] = heap[start(sym_i) + j]
    lens = exp_len[stream]
    idx = np.repeat(heap_off[stream], lens) + ragged_arange(lens)
    return heap[idx]


# ---------------------------------------------------------------- dispatch

_ENCODERS = {PLAIN: enc_plain, FOR: enc_for, DELTA: enc_delta, RLE: enc_rle, DICT: enc_dict, FSST: enc_fsst, BSS: enc_bss}
_DECODERS = {PLAIN: dec_plain, FOR: dec_for, DELTA: dec_delta, RLE: dec_rle, DICT: dec_dict, FSST: dec_fsst, BSS: dec_bss}
# codecs whose wire format depends on element width (the rest store i64
# refs/dict values already, or — fsst — are int32-only by contract)
_WIDE_AWARE_ENC = {PLAIN: True, FOR: False, DELTA: False, RLE: False, DICT: True, FSST: False, BSS: True}
WIDE_CODECS = frozenset({"plain", "for", "delta", "rle", "dict", "bss"})


def encode_int_body(codec_id: int, arr: np.ndarray, wide: bool = False, fact=None) -> bytes:
    if wide and codec_id == FSST:
        raise ValueError("fsst is int32-only; wide integer streams use plain/for/delta/rle/dict/bss")
    if codec_id == DICT:
        return enc_dict(arr, wide=wide, fact=fact)
    if codec_id == FSST:
        return enc_fsst(arr, fact=fact)
    if wide and _WIDE_AWARE_ENC[codec_id]:
        return _ENCODERS[codec_id](arr, wide=True)
    return _ENCODERS[codec_id](arr)


def decode_int_body(codec_id: int, body: memoryview, wide: bool = False) -> np.ndarray:
    if codec_id == FSST:
        return dec_fsst(body)
    return _DECODERS[codec_id](body, wide)
