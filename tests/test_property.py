"""Property-based codec roundtrips (SURVEY.md §5 plan: random token arrays —
all-equal, runs, uniform-random, Zipf, empty, single, full int32 range)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tokenlake.codecs import decode_column, encode_int_column
from tokenlake.codecs.bitio import pack_uints, unpack_uints
from tokenlake.stats import compute_chunk_stats
from tokenlake.select import select_codec

INT32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
CODECS = ["plain", "for", "delta", "rle", "dict", "fsst"]


@st.composite
def token_arrays(draw):
    shape = draw(st.sampled_from(["raw", "runs", "zipf", "equal"]))
    n = draw(st.integers(min_value=0, max_value=3000))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    if shape == "raw" or n == 0:
        vals = draw(st.lists(INT32, min_size=min(n, 40), max_size=min(n, 40)))
        return np.array(vals, dtype=np.int32)
    if shape == "runs":
        runs = rng.integers(1, 50, max(n // 20, 1))
        return np.repeat(rng.integers(-100, 100, len(runs)), runs)[:n].astype(np.int32)
    if shape == "zipf":
        return np.minimum(rng.zipf(1.5, n), 2**31 - 1).astype(np.int32)
    return np.full(n, draw(INT32), dtype=np.int32)


@settings(max_examples=60, deadline=None)
@given(arr=token_arrays(), codec=st.sampled_from(CODECS))
def test_every_codec_roundtrips_any_array(arr, codec):
    buf = encode_int_column(arr, codec, outer="none")
    np.testing.assert_array_equal(decode_column(buf), arr)


@settings(max_examples=40, deadline=None)
@given(arr=token_arrays())
def test_auto_selection_roundtrips_and_never_blows_up(arr):
    st_ = compute_chunk_stats(arr, max(len(arr), 1))
    d = select_codec(arr, st_)
    buf = encode_int_column(arr, d.codec, outer="auto")
    np.testing.assert_array_equal(decode_column(buf), arr)
    assert len(buf) <= 4 * len(arr) + 64


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=0, max_value=64),
    n=st.integers(min_value=0, max_value=2000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pack_unpack_any_width(width, n, seed):
    hi = (1 << width) - 1 if width else 0
    vals = (
        np.random.default_rng(seed).integers(0, hi + 1 if hi < 2**63 else 2**63, n, dtype=np.uint64)
        if width
        else np.zeros(n, dtype=np.uint64)
    )
    if width == 64 and n:
        vals = vals * 2 + 1  # exercise the top bit
    assert np.array_equal(unpack_uints(pack_uints(vals, width), n, width), vals)


@settings(max_examples=40, deadline=None)
@given(
    arr=token_arrays(),
    codec=st.sampled_from(CODECS),
    cut=st.integers(min_value=1, max_value=64),
    outer=st.sampled_from(["none", "zstd"]),
)
def test_truncation_never_decodes_wrong(arr, codec, cut, outer):
    """Integrity property: decoding a truncated container either raises or
    (if the cut only removed redundancy) returns the EXACT original — it must
    never silently return fewer/other values. Backed by the raw_len check in
    container.unwrap."""
    buf = encode_int_column(arr, codec, outer=outer)
    cut = min(cut, len(buf) - 1)
    if cut <= 0:
        return
    try:
        out = decode_column(buf[: len(buf) - cut])
    except Exception:
        return
    np.testing.assert_array_equal(out, arr)


# ---------------------------------------------------------------------------
# whole-registry chunk fuzz: random schemas through encode_chunk → decode
# ---------------------------------------------------------------------------

def test_random_schema_chunk_roundtrip():
    """Any flat schema the generic registry admits — every scalar family,
    decimal64/128, fixed-size binary, temporal units, list extras — drawn
    at random with independent null patterns, must round-trip bit-exactly
    through encode_chunk → decode_chunk_row (no Spark; the same kernels the
    applyInArrow stage runs)."""
    from decimal import Context, Decimal

    from hypothesis import given, settings, strategies as st

    from tokenlake.decode_job import decode_chunk_row
    from tokenlake.encode_job import encode_chunk

    ctx = Context(prec=60)

    def col_strategy(t):
        nullable = lambda s: st.one_of(st.none(), s)  # noqa: E731
        if pa.types.is_integer(t):
            info = np.iinfo(t.to_pandas_dtype())
            return nullable(st.integers(int(info.min), int(info.max)))
        if pa.types.is_floating(t):
            return nullable(st.floats(allow_nan=False, allow_infinity=True, width=32 if t == pa.float32() else 64))
        if pa.types.is_boolean(t):
            return nullable(st.booleans())
        if pa.types.is_string(t):
            return nullable(st.text(max_size=12))
        if pa.types.is_fixed_size_binary(t):
            return nullable(st.binary(min_size=t.byte_width, max_size=t.byte_width))
        if pa.types.is_binary(t):
            return nullable(st.binary(max_size=12))
        if pa.types.is_timestamp(t):
            # deliberately beyond datetime.year 9999: the carrier must not
            # round-trip through Python datetime objects
            return nullable(st.integers(0, 2**62))
        if pa.types.is_time64(t):
            return nullable(st.integers(0, 86_399_999_999))  # in-day µs
        if pa.types.is_time32(t):
            return nullable(st.integers(0, 80000 if t.unit == "s" else 80_000_000))
        if pa.types.is_date32(t):
            return nullable(st.integers(-30000, 30000))
        if pa.types.is_decimal(t):
            return nullable(st.integers(-(10**t.precision) + 1, 10**t.precision - 1))
        raise AssertionError(t)

    def to_arrow(vals, t):
        if pa.types.is_decimal(t):
            vals = [None if v is None else Decimal(v).scaleb(-t.scale, ctx) for v in vals]
            return pa.array(vals, t)
        if pa.types.is_timestamp(t) or pa.types.is_time64(t) or pa.types.is_time32(t) or pa.types.is_date32(t):
            storage = {"date32": pa.int32(), "time32": pa.int32()}.get(
                "date32" if pa.types.is_date32(t) else "time32" if pa.types.is_time32(t) else "", pa.int64()
            )
            return pa.array(vals, storage).cast(t)
        return pa.array(vals, t)

    TYPE_MENU = [
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.float32(), pa.float64(), pa.bool_(), pa.string(), pa.binary(),
        pa.timestamp("us"), pa.timestamp("us", tz="UTC"), pa.date32(),
        pa.time64("us"), pa.time32("ms"),
        pa.decimal128(14, 2), pa.decimal128(38, 6), pa.binary(5),
        pa.list_(pa.int32()), pa.list_(pa.float32()), pa.list_(pa.decimal128(38, 4)),
    ]

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def check(data):
        n = data.draw(st.integers(1, 30))
        type_idx = data.draw(
            st.lists(st.integers(0, len(TYPE_MENU) - 1), min_size=1, max_size=3, unique=True)
        )
        doc_ids = [f"d{i:04d}-{data.draw(st.integers(0, 9))}" for i in range(n)]
        ntoks = [data.draw(st.integers(0, 6)) for _ in range(n)]
        null_rows = [data.draw(st.booleans()) and i % 4 == 0 for i in range(n)]
        toks = [
            None if null_rows[i]
            else [data.draw(st.integers(-(2**31), 2**31 - 1)) for _ in range(ntoks[i])]
            for i in range(n)
        ]
        cols = {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "n_tok": pa.array(
                [None if null_rows[i] else ntoks[i] for i in range(n)], pa.int32()
            ),
            "source": pa.array(["s"] * n, pa.string()),
            "chunk_id": pa.array(["s#0"] * n, pa.string()),
            "nbuckets": pa.array([1] * n, pa.int32()),
        }
        for j, ti in enumerate(type_idx):
            t = TYPE_MENU[ti]
            name = f"x{j}"
            if pa.types.is_list(t):
                et = t.value_type
                vals = [
                    None if data.draw(st.booleans()) and i % 3 == 0
                    else to_arrow(
                        [data.draw(col_strategy(et)) for _ in range(data.draw(st.integers(0, 4)))],
                        et,
                    ).to_pylist()
                    for i in range(n)
                ]
                cols[name] = pa.array(vals, t)  # elements already typed
            else:
                cols[name] = to_arrow([data.draw(col_strategy(t)) for _ in range(n)], t)
        table = pa.table(cols)
        enc = encode_chunk(table)
        payloads = {
            c[len("payload_") :]: enc.column(c)[0].as_py()
            for c in enc.column_names
            if c.startswith("payload_")
        }
        out = decode_chunk_row(payloads, columns=tuple(payloads))
        # encode sorts rows by doc_id (nulls last; ids here are unique+non-null)
        order = np.argsort(np.array(doc_ids))
        for name in payloads:
            want = cols[name].take(pa.array(order, pa.int64()))
            got = out.column(name)
            got = got.combine_chunks() if isinstance(got, pa.ChunkedArray) else got
            want = want.cast(got.type)  # decode narrows (fsb→binary, time→ns)
            assert got.equals(want), (name, got.to_pylist(), want.to_pylist())

    check()


def test_random_forced_codec_roundtrip():
    """Forced per-column codecs (the prescription DSL path) over random
    extras: any family-valid codec choice must round-trip bit-exactly —
    the encoder honors the directive rather than silently re-selecting."""
    from decimal import Context, Decimal

    from hypothesis import given, settings, strategies as st

    from tokenlake.decode_job import decode_chunk_row
    from tokenlake.encode_job import encode_chunk
    from tokenlake.plan import Prescription

    ctx = Context(prec=60)
    CASES = [
        # (arrow type, valid forced codecs, value builder)
        (pa.int32(), ["plain", "for", "delta", "rle", "dict", "fsst"],
         lambda d: d.draw(st.integers(-(2**31), 2**31 - 1))),
        (pa.int64(), ["plain", "for", "delta", "rle", "dict"],
         lambda d: d.draw(st.integers(-(2**63), 2**63 - 1))),
        (pa.float64(), ["plain", "bss"],
         lambda d: d.draw(st.floats(allow_nan=False, width=64))),
        (pa.string(), ["str_plain", "str_dict", "str_prefix"],
         lambda d: d.draw(st.text(max_size=10))),
        (pa.decimal128(38, 3), ["plain", "for", "delta", "rle", "dict"],
         lambda d: Decimal(d.draw(st.integers(-(10**37), 10**37))).scaleb(-3, ctx)),
    ]

    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def check(data):
        n = data.draw(st.integers(1, 20))
        ti = data.draw(st.integers(0, len(CASES) - 1))
        t, codecs, builder = CASES[ti]
        codec = data.draw(st.sampled_from(codecs))
        vals = [None if data.draw(st.booleans()) and i % 3 == 0 else builder(data)
                for i in range(n)]
        cols = {
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)], pa.string()),
            "tokens": pa.array([[1, 2]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array(["s"] * n, pa.string()),
            "chunk_id": pa.array(["s#0"] * n, pa.string()),
            "nbuckets": pa.array([1] * n, pa.int32()),
            "x": pa.array(vals, t),
        }
        cfg = Prescription.parse(f"set column x encoding {codec}").apply()
        enc = encode_chunk(pa.table(cols), cfg=cfg)
        payloads = {
            c[len("payload_") :]: enc.column(c)[0].as_py()
            for c in enc.column_names
            if c.startswith("payload_")
        }
        out = decode_chunk_row(payloads, columns=("doc_id", "x"))
        got = out.column("x")
        got = got.combine_chunks() if isinstance(got, pa.ChunkedArray) else got
        assert got.cast(t).equals(pa.array(vals, t))  # ids pre-sorted

    check()
