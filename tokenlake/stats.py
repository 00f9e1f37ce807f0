"""Per-chunk column statistics — the ColumnContext analog, numpy-vectorized.

The reference builds one ColumnContext per leaf column from footer metadata +
one ≤16,384-row sample (src/parquet-linter/src/column_context.rs:12-34,
129-186; SAMPLE_ROWS at cardinality.rs:29). We compute the same quantities per
*encode chunk* directly from the in-memory Arrow batch inside the encode UDF —
cheap because the data is already resident, and exactly the stats the codec
cost model (select.py) consumes.

Cardinality policy mirrors the 3-tier estimator (doc/cardinality.md):
- exact NDV of the head sample (tier-3 hash-sample analog, vectorized)
- ratio scale-up with clamping (`scale_distinct`, cardinality.rs:148-157)
- conservative fallback: unresolved ⇒ assume all-distinct (cardinality.rs:102-113)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SAMPLE_VALUES = 16_384  # reference SAMPLE_ROWS (cardinality.rs:29)


@dataclass
class ChunkStats:
    """Stats for one (chunk, column) of int32 values."""

    n_values: int
    n_rows: int
    min_val: int
    max_val: int
    ndv_sample: int
    sample_n: int
    distinct_est: int          # ratio-scaled, clamped (C6)
    run_count_sample: int
    sorted_frac: float         # fraction of non-negative sample deltas
    max_zz_delta: int          # max zigzag(diff) over the sample
    avg_delta_width: float     # mean per-128-block bit width of zigzag diffs
    avg_fanout: float
    raw_bytes: int

    @property
    def cardinality_ratio(self) -> float:
        """distinct/non-null (column_context.rs:49-56)."""
        return self.distinct_est / self.n_values if self.n_values else 1.0

    @property
    def run_ratio(self) -> float:
        return self.run_count_sample / self.sample_n if self.sample_n else 1.0


def scale_distinct(sample_distinct: int, sample_n: int, total: int) -> int:
    """distinct ≈ clamp(ratio × total, ≥ sample_distinct, ≤ total)
    (reference `scale_distinct`, cardinality.rs:148-157)."""
    if sample_n == 0 or total == 0:
        return 0
    if sample_n >= total:
        return sample_distinct
    est = int(round(sample_distinct / sample_n * total))
    return max(sample_distinct, min(est, total))


def extrapolate_stats(st: ChunkStats, fraction: float) -> ChunkStats:
    """Scale stats computed on a `fraction` row-sample of a chunk up to
    full-chunk magnitudes (the C6 ratio scale-up applied to the lint path):
    extensive quantities (n_values, n_rows, raw_bytes) divide by the
    fraction, distinct re-scales with clamping (scale_distinct,
    cardinality.rs:148-157), intensive quantities (bounds, run/sorted
    ratios, delta widths) carry over unchanged. Without this, fixed codec
    costs (dictionary/FSST tables) dominate small-sample estimates and the
    lint picks differently than the full encode would."""
    if fraction >= 1.0 or st.n_values == 0:
        return st
    total = max(st.n_values, int(round(st.n_values / fraction)))
    n_rows = max(st.n_rows, int(round(st.n_rows / fraction)))
    if st.distinct_est < 0.5 * st.n_values:
        # saturated sample: values repeat heavily, so the sampled NDV already
        # ≈ the true NDV — the same tier-2 saturation signal that triggers
        # the exact resolve in compute_chunk_stats. Linear scale-up here
        # would inflate a 500-value dictionary to tens of thousands.
        distinct = st.distinct_est
    else:
        # all-distinct regime: conservative linear scale-up with clamping
        distinct = scale_distinct(st.distinct_est, st.n_values, total)
    return ChunkStats(
        n_values=total,
        n_rows=n_rows,
        min_val=st.min_val,
        max_val=st.max_val,
        ndv_sample=st.ndv_sample,
        sample_n=st.sample_n,
        distinct_est=distinct,
        run_count_sample=st.run_count_sample,
        sorted_frac=st.sorted_frac,
        max_zz_delta=st.max_zz_delta,
        avg_delta_width=st.avg_delta_width,
        avg_fanout=st.avg_fanout,
        # preserve the source width: raw_bytes scales with the value count
        raw_bytes=int(st.raw_bytes / max(st.n_values, 1) * total) if st.n_values else 0,
    )


def _avg_block_width(zz: np.ndarray, block: int = 128) -> float:
    """Mean per-miniblock bit width — matches enc_delta's miniblock layout so
    the analytical delta estimate is unbiased even with per-row resets."""
    m = len(zz)
    if m == 0:
        return 0.0
    nblocks = (m + block - 1) // block
    zzp = np.pad(zz, (0, nblocks * block - m)).reshape(nblocks, block)
    maxes = zzp.max(axis=1).astype(np.float64)
    widths = np.where(maxes > 0, np.floor(np.log2(np.maximum(maxes, 1))) + 1, 0.0)
    return float(widths.mean())


def compute_chunk_stats(
    flat: np.ndarray,
    n_rows: int,
    full: bool = False,
    ndv_resolver=None,
    minmax: tuple[int, int] | None = None,
) -> ChunkStats:
    """Stats over the flat token stream of one chunk (head-of-chunk sample,
    mirroring the reference's first-row-group sampling, cardinality.rs:116-122).

    `full=True` computes every quantity over the WHOLE stream — exact NDV,
    run count, sortedness — for the deterministic full-depth lint whose
    decisions a SQL oracle replays (no sampling noise allowed there).

    `ndv_resolver`: optional zero-arg callable returning the exact NDV,
    invoked ONLY when the saturation tier fires. The encode path passes one
    that factorizes the stream and caches the result for the dictionary
    encoder — the exact-NDV hash pass and the dict-table build were the same
    work done twice (the reference reads the dictionary page once for both,
    cardinality.rs:160-177)."""
    n = len(flat)
    if n == 0:
        return ChunkStats(0, n_rows, 0, 0, 0, 0, 0, 0, 1.0, 0, 0.0, 0.0, 0)
    sample = flat if full else flat[:SAMPLE_VALUES]
    sn = len(sample)
    s64 = sample.astype(np.int64)
    d = np.diff(s64)
    zz = ((d << 1) ^ (d >> 63)).astype(np.uint64)
    runs = 1 + int(np.count_nonzero(d)) if sn > 1 else sn
    ndv = len(np.unique(sample))
    if not full and ndv < 0.5 * sn and n > sn:
        # tier-2 analog: sample saturated ⇒ dictionary plausible ⇒ resolve NDV
        # exactly with one hash pass (reference reads the dictionary page for
        # the exact count, cardinality.rs:160-177; pd.unique is our dict page)
        if ndv_resolver is not None:
            distinct_est = int(ndv_resolver())
        else:
            import pandas as pd

            distinct_est = len(pd.unique(flat))
    else:
        distinct_est = scale_distinct(ndv, sn, n)
    return ChunkStats(
        n_values=n,
        n_rows=n_rows,
        min_val=minmax[0] if minmax is not None else int(flat.min()),
        max_val=minmax[1] if minmax is not None else int(flat.max()),
        ndv_sample=ndv,
        sample_n=sn,
        distinct_est=distinct_est,
        run_count_sample=runs,
        sorted_frac=float((d >= 0).mean()) if sn > 1 else 1.0,
        max_zz_delta=int(zz.max()) if sn > 1 else 0,
        avg_delta_width=_avg_block_width(zz),
        avg_fanout=n / n_rows if n_rows else 0.0,
        # true carrier width, not a 4 B constant (wide int64/double views
        # are 8 B/value; decimal128's LO-WORD view still reads 8 — its true
        # 16 B width is handled by the callers that know the logical type)
        raw_bytes=flat.dtype.itemsize * n,
    )
