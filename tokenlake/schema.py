"""Input schema + deterministic synthetic sequence generation (FIXTURES.md §1).

Input table shape per BASELINE.json input_hint:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Each `source` value names a token-content profile engineered so every codec /
selection rule has a fixture that must trigger it and one that must not —
mirroring the reference's golden "file-pattern" unit tests
(src/parquet-linter/src/rules/string_encoding.rs:194-243,
src/parquet-linter/src/rules/compression_codec.rs:332-356).

All generation is numpy-vectorized and seeded; the same (scale, seed) always
produces the identical table (resume fingerprints depend on it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEQUENCES_SPARK_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

SEQ_ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.large_list(pa.int32()), nullable=False),
        pa.field("n_tok", pa.int32(), nullable=False),
        pa.field("source", pa.string(), nullable=False),
    ]
)

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1

# profile → (base_rows, min_len, max_len); FIXTURES.md §1 table
PROFILE_ROWS = {
    "lowcard": (20_000, 64, 512),
    "runs": (10_000, 256, 2048),
    "sorted_ts": (10_000, 128, 1024),
    "smallrange": (10_000, 128, 1024),
    "ngram": (10_000, 256, 2048),
    "random": (10_000, 128, 1024),
    "highcard": (10_000, 128, 1024),
    "embedlike": (5_000, 256, 256),
    "edge": (1_000, 0, 4096),
}

EXPECTED_WINNER = {
    # FIXTURES.md "expected winning codec" column; the pytest selection gate
    "lowcard": "dict",
    "runs": "rle",
    "sorted_ts": "delta",
    "smallrange": {"for", "dict"},  # 12-bit range; dict also legal if ndv tiny
    "ngram": "fsst",
    "random": "plain",
}


def _row_lengths(rng: np.random.Generator, rows: int, lo: int, hi: int) -> np.ndarray:
    if lo == hi:
        return np.full(rows, lo, dtype=np.int64)
    return rng.integers(lo, hi + 1, rows).astype(np.int64)


def _gen_profile(name: str, rng: np.random.Generator, rows: int, lo: int, hi: int):
    """Return (flat_values:int32, row_lengths:int64) for a profile."""
    lens = _row_lengths(rng, rows, lo, hi)
    total = int(lens.sum())
    if name == "lowcard":
        # 500 distinct token ids scattered over the int32 space (a real BPE
        # vocab subset is sparse) — dictionary must win, FOR must not
        vocab = rng.choice(np.arange(1, INT32_MAX, INT32_MAX // 501, dtype=np.int64), 500, replace=False)
        flat = vocab[rng.integers(0, 500, total)]
    elif name == "runs":
        # ~500-token runs of one of 20 values, spanning row boundaries
        n_runs = total // 300 + 2  # min run len 300 ⇒ total coverage guaranteed
        run_vals = rng.integers(0, 20, n_runs)
        run_lens = rng.integers(300, 700, n_runs)
        flat = np.repeat(run_vals, run_lens)[:total]
    elif name == "sorted_ts":
        gaps = rng.integers(1, 64, total)
        g = np.cumsum(gaps)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        # reset the cumsum at each row start → per-row monotone sequences
        flat = g - np.repeat(g[starts] - gaps[starts], lens) + 1_000_000
    elif name == "smallrange":
        flat = 100_000 + rng.integers(0, 1 << 12, total)
    elif name == "ngram":
        pool = [rng.integers(0, 5000, rng.integers(4, 9)).astype(np.int64) for _ in range(200)]
        pool_flat = np.concatenate(pool)
        pool_lens = np.array([len(p) for p in pool], dtype=np.int64)
        pool_offs = np.r_[0, np.cumsum(pool_lens)[:-1]]
        n_slots = total // 4 + 1
        ids = rng.integers(0, 200, n_slots)
        noise = rng.random(n_slots) < 0.10
        slot_lens = pool_lens[ids]
        # vectorized gather of each chosen phrase
        reps = np.repeat(pool_offs[ids], slot_lens) + _ragged_arange(slot_lens)
        flat = pool_flat[reps]
        noise_mask = np.repeat(noise, slot_lens)
        flat[noise_mask] = rng.integers(0, 5000, int(noise_mask.sum()))
        flat = flat[:total]
        if len(flat) < total:  # pad (can't happen with n_slots sized for min len 4)
            flat = np.r_[flat, rng.integers(0, 5000, total - len(flat))]
    elif name == "random":
        flat = rng.integers(INT32_MIN, INT32_MAX + 1, total, dtype=np.int64)
    elif name == "highcard":
        flat = rng.integers(0, max(2, int(total * 1.5)), total)
    elif name == "embedlike":
        flat = rng.integers(0, 1 << 16, total)
    elif name == "edge":
        return _gen_edge(rng, rows)
    else:
        raise ValueError(f"unknown profile {name}")
    return flat.astype(np.int32), lens


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] vectorized. Zero-length entries are
    handled exactly (the old cumsum-reset formulation let a later reset
    overwrite an earlier one at the shared start index, silently corrupting
    the counters after any empty row; zero TOTAL IndexErrored)."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def _gen_edge(rng: np.random.Generator, rows: int):
    """Adversarial rows: empty, single, all-identical, extremes (FIXTURES.md)."""
    arrays: list[np.ndarray] = []
    specials = [
        np.empty(0, dtype=np.int32),
        np.array([0], dtype=np.int32),
        np.array([INT32_MAX], dtype=np.int32),
        np.array([INT32_MIN], dtype=np.int32),
        np.full(4096, -1, dtype=np.int32),
        np.array([0, -1, 1, INT32_MAX, INT32_MIN], dtype=np.int32),
    ]
    for i in range(rows):
        if i < len(specials):
            arrays.append(specials[i])
        elif i % 3 == 0:
            arrays.append(np.full(int(rng.integers(1, 100)), int(rng.integers(INT32_MIN, INT32_MAX)), dtype=np.int32))
        elif i % 3 == 1:
            arrays.append(rng.integers(INT32_MIN, INT32_MAX + 1, int(rng.integers(0, 64)), dtype=np.int64).astype(np.int32))
        else:
            arrays.append(np.empty(0, dtype=np.int32))
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    flat = np.concatenate(arrays) if arrays else np.empty(0, dtype=np.int32)
    return flat.astype(np.int32), lens


def generate_sequences(
    scale: float = 1.0,
    seed: int = 42,
    profiles: list[str] | None = None,
    skew: bool = True,
) -> pa.Table:
    """Deterministic sequences table. With skew=True the `lowcard` source is
    boosted ×8 so one source holds ~70% of rows (FIXTURES.md: exercises
    salting / bucket fan-out on the hot key)."""
    names = profiles or list(PROFILE_ROWS)
    parts_flat, parts_lens, parts_src = [], [], []
    for name in names:
        base_rows, lo, hi = PROFILE_ROWS[name]
        rows = max(1, int(base_rows * scale))
        if skew and name == "lowcard":
            rows *= 8
        # zlib.crc32, not hash(): Python string hashing is randomized per
        # process (PYTHONHASHSEED), which silently broke the "same (scale,
        # seed) ⇒ identical table" guarantee across driver processes
        import zlib

        rng = np.random.default_rng(np.random.SeedSequence([seed, zlib.crc32(name.encode())]))
        flat, lens = _gen_profile(name, rng, rows, lo, hi)
        parts_flat.append(flat)
        parts_lens.append(lens)
        parts_src.append(name)
    return _assemble(parts_flat, parts_lens, parts_src, seed)


def _assemble(parts_flat, parts_lens, parts_src, seed: int) -> pa.Table:
    rows_per = [len(l) for l in parts_lens]
    n = sum(rows_per)
    source = np.repeat(np.array(parts_src, dtype=object), rows_per)
    lens = np.concatenate(parts_lens) if parts_lens else np.empty(0, np.int64)
    # doc_id: unique, per-source counter → f"{source}-{i:012d}" (FIXTURES.md)
    within = _ragged_arange(np.array(rows_per, dtype=np.int64)) if n else np.empty(0, np.int64)
    import pandas as pd

    doc_id = pd.Series(source).str.cat(pd.Series(within).astype(str).str.zfill(12), sep="-")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate(parts_flat) if parts_flat else np.empty(0, np.int32)
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
            "source": pa.array(source, type=pa.string()),
        },
        schema=SEQ_ARROW_SCHEMA,
    )
    # deterministic interleave so sources mix across Spark partitions
    perm = np.random.default_rng(seed).permutation(n)
    return tbl.take(pa.array(perm))


def write_sequences_parquet(path: str, scale: float = 1.0, seed: int = 42, **kw) -> str:
    import pyarrow.parquet as pq

    tbl = generate_sequences(scale=scale, seed=seed, **kw)
    pq.write_table(tbl, path)
    return path


def sequences_from_documents(spark, sf_dir: str):
    """Derive a sequences table from the driver's documents.parquet: a
    deterministic whitespace/punct tokenizer hashed to int32 ids — the
    'real data' input for the bench (TESTDATA.md tables are the only
    permitted external inputs)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.expr(
        "transform(filter(split(lower(text), '[^a-z0-9]+'), w -> w <> ''), "
        "w -> cast(abs(cast(hash(w) as bigint)) % 65536 as int))"
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source").alias("source"),
    )
