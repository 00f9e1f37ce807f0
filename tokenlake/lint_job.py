"""The lint job: sampled plan-only analysis — the reference's primary entry.

`parquet-linter FILE` (reference src/parquet-linter/src/lib.rs:18-46) reads
footer metadata plus one ≤16,384-row sample and emits diagnostics WITHOUT
touching the rest of the data. The engine's analog: sample a fraction of rows
*before* the chunk shuffle (mirroring the 5% ambiguous-row-group sampling of
dictionary_encoding.rs:155-172), run the stats + selector on the sample only,
and emit a decisions DataFrame (the Diagnostic analog, diagnostic.rs:55-61) —
no payload encode, no full-data pass beyond the planning aggregate.

Spark shape: `sample → assign_chunks → applyInArrow(lint_chunk)` — identical
plan skeleton to the encode job so lint decisions predict encode decisions,
but the shuffle moves only the sampled fraction.

Lifecycle parity with the reference (SURVEY.md §3.1-3.2):
    decisions = lint_job.lint(spark, df)                  # lint
    rx = lint_job.prescription_from_decisions(decisions)  # merge → DSL
    encode_job.run(spark, df, out, cfg=rx.apply())        # rewrite
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .chunking import (
    MAX_CHUNK_ROWS,
    MAX_CHUNK_VALUES,
    assign_chunks,
    buckets_from_totals,
    plan_buckets,
)
from .plan import EncodeConfig, Prescription, plan_from_decisions
from .select import estimate_dictionary_payload_bytes, select_codec
from .stats import compute_chunk_stats, extrapolate_stats

LINT_SCHEMA = (
    "chunk_id string, column string, codec string, rule string, "
    "severity string, est_bytes long, sample_rows long, sample_values long, "
    "distinct_est long, max_zz_delta long, min_val long, max_val long, "
    "cardinality_ratio double, run_ratio double, sorted_frac double, "
    "body_bytes long, outer_ratio double, dict_payload_bytes long, "
    "location string"
)
# `location` is the Diagnostic Location analog (diagnostic.rs:37-41):
# "column" = per-column-chunk decisions (Location::Column), "chunk" =
# row-group-scoped invariants from lint_lineage (Location::RowGroup);
# file-scoped outcomes surface as `set file ...` DSL directives
# (Location::File has no per-chunk row to hang on).

_OUTER_TRIAL_BYTES = 1 << 16  # bounded zstd-3 trial sample per chunk


def lint_chunk(
    t: pa.Table,
    cfg: EncodeConfig | None = None,
    fraction: float = 1.0,
    full_stats: bool = False,
) -> pa.Table:
    """Stats + selection over one chunk's sampled rows → decision rows.

    `fraction` is the row-sampling rate the rows arrived at; stats are
    extrapolated to full-chunk magnitudes before the cost model so that
    fixed codec costs (dict/FSST tables) amortize the way they will in the
    real encode — a 0.5% screening sample then picks the same codec a 30%
    sample does.

    `full_stats` sorts the chunk by doc_id (encode order) and computes every
    stat over the whole stream — the deterministic mode the SQL lint oracle
    replays (order-sensitive quantities like run_ratio would otherwise
    depend on shuffle arrival order)."""
    from .codecs import encode_int_column
    from .codecs.container import _outer_compress

    cfg = cfg or EncodeConfig()
    t = (t.sort_by("doc_id") if full_stats else t).combine_chunks()
    chunk_id = t.column("chunk_id")[0].as_py()
    n_rows = t.num_rows
    toks = t.column("tokens").chunk(0) if t.column("tokens").num_chunks else pa.array([], pa.list_(pa.int32()))
    if toks.null_count:
        toks = toks.drop_null()
    tok_values = toks.flatten()
    if tok_values.null_count:
        # same contract as encode_chunk: silently coercing null elements
        # would feed NaN-garbage int32 into the stats and emit decisions
        # for an encode that will actually fail
        raise ValueError(
            "null token elements not supported (contract: array<int32 NOT NULL>)"
        )
    flat = tok_values.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    ntok_col = t.column("n_tok")
    lens = (
        ntok_col.drop_null() if ntok_col.null_count else ntok_col
    ).to_numpy(zero_copy_only=False).astype(np.int32)

    rows = []

    def emit(column, st, d, body, nv, elem_bytes=4):
        # the severity baseline is PLAIN at the column's true element width
        # (a 4 B constant understated 64-bit columns' savings by 2x and
        # misfiled >50% wins as suggestions)
        plain_bytes = elem_bytes * max(st.n_values, 1) if st else max(len(body), 1)
        saving = 1.0 - d.est_bytes / plain_bytes if st else 0.0
        # Severity ordering mirrors diagnostic.rs:8-12: big wins are warnings
        # (you are leaving >50% on the table), marginal ones suggestions;
        # `error` is reserved for broken invariants (lint_lineage).
        severity = "warning" if saving > 0.5 else "suggestion"
        trial = bytes(body[-_OUTER_TRIAL_BYTES:]) if len(body) > _OUTER_TRIAL_BYTES else bytes(body)
        outer_ratio = len(_outer_compress("zstd", 3, trial)) / max(len(trial), 1)
        rows.append(
            {
                "chunk_id": chunk_id,
                "column": column,
                "codec": d.codec,
                "rule": d.rule,
                "severity": severity,
                "est_bytes": int(d.est_bytes),
                "sample_rows": n_rows,
                "sample_values": nv,
                "distinct_est": int(st.distinct_est) if st else 0,
                # zigzag deltas are uint64: a full-range double bit-pattern
                # column can exceed int64 and overflow the row schema; the
                # stat only feeds bit-width comparisons, and the clamp keeps
                # width_for at 63 vs 64 — both read "delta does not pay"
                "max_zz_delta": min(int(st.max_zz_delta), (1 << 63) - 1) if st else 0,
                "min_val": int(st.min_val) if st else 0,
                "max_val": int(st.max_val) if st else 0,
                "cardinality_ratio": float(st.cardinality_ratio) if st else 1.0,
                "run_ratio": float(st.run_ratio) if st else 1.0,
                "sorted_frac": float(st.sorted_frac) if st else 1.0,
                "body_bytes": len(body),
                "outer_ratio": float(outer_ratio),
                "dict_payload_bytes": int(estimate_dictionary_payload_bytes(st)) if st else 0,
                "location": "column",
            }
        )

    for column, values, nv in (("tokens", flat, len(flat)), ("n_tok", lens, n_rows)):
        st = extrapolate_stats(compute_chunk_stats(values, n_rows, full=full_stats), fraction)
        d = select_codec(
            values, st, forced=cfg.overrides.get(column),
            allow_dict=f"!dict:{column}" not in cfg.overrides,
            dict_page_limit=cfg.dict_limit_for(column),
        )
        # R2 inputs: real sampled encode body + bounded zstd-3 trial ratio
        # (the reference samples one row group, column_context.rs:543)
        body = encode_int_column(values, d.codec, outer="none")
        emit(column, st, d, body, nv)

    # extra columns: the reference lints EVERY leaf column of a flat schema
    # (lib.rs:18-46 over column_context.rs:213-292); same dispatch as the
    # encoder's generic registry, stats-only depth
    from .encode_job import _pick_str_codec, extra_columns_of
    from .select import Decision, select_float_codec

    for name in extra_columns_of(t.schema.names):
        from .codecs.container import (
            DT_BOOL,
            DT_FLOAT32,
            DT_FLOAT64,
            dtype_of_arrow,
            int_view_of,
            is_string_kind,
            is_wide,
        )
        from .codecs.strcodecs import STR_CODEC_IDS, encode_str_body

        arr = t.column(name)
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], t.schema.field(name).type)
        # list extras lint over their FLATTENED element stream (the tokens
        # treatment generalized — stats/codec choice are element-level, the
        # lengths frame is plan-invisible)
        nv = n_rows
        if pa.types.is_fixed_size_list(arr.type):
            arr = arr.cast(pa.list_(arr.type.value_type))
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            arr = arr.flatten()
            nv = len(arr)
        dtype = dtype_of_arrow(arr.type)
        valid = arr.drop_null() if arr.null_count else arr
        if is_string_kind(dtype):
            from .codecs.container import DT_FIXED_BINARY

            # same cast the encode trial race applies: fixed-size binary
            # holds arbitrary bytes — a large_string cast crashes on
            # non-UTF-8 payloads the encoder accepts
            trial = (
                valid.cast(pa.large_binary()) if dtype == DT_FIXED_BINARY else valid
            )
            forced_s = cfg.overrides.get(name)
            if forced_s:
                from .encode_job import _coerce_str_codec

                codec, body, rule = _coerce_str_codec(forced_s), None, "forced"
            else:
                codec, body, rule = _pick_str_codec(
                    trial, allow_dict=f"!dict:{name}" not in cfg.overrides
                )
            if body is None:
                body = encode_str_body(STR_CODEC_IDS[codec], trial)
            emit(name, None, Decision(codec, len(body), rule), body, nv)
            continue
        view = int_view_of(valid, dtype) if len(valid) else np.empty(0, np.int32)
        wide = is_wide(dtype)
        st = extrapolate_stats(compute_chunk_stats(view, n_rows, full=full_stats), fraction)
        if dtype == DT_BOOL:
            d = Decision("for", (st.n_values + 7) // 8, "bool-bitpack")
        elif dtype in (DT_FLOAT32, DT_FLOAT64):
            d = select_float_codec(
                view, st, forced=cfg.overrides.get(name), wide=wide,
                allow_dict=f"!dict:{name}" not in cfg.overrides,
                dict_page_limit=cfg.dict_limit_for(name),
            )
        else:
            d = select_codec(
                view, st, forced=cfg.overrides.get(name),
                allow_dict=f"!dict:{name}" not in cfg.overrides,
                dict_page_limit=cfg.dict_limit_for(name),
                wide=wide,
            )
        from .codecs.intcodecs import INT_CODEC_IDS, encode_int_body

        body = encode_int_body(INT_CODEC_IDS[d.codec], view, wide=wide)
        from .codecs.container import DT_DECIMAL128

        emit(name, st, d, body, nv,
             elem_bytes=16 if dtype == DT_DECIMAL128 else 8 if wide else 4)
    return pa.Table.from_pylist(rows)


# strided share of ambiguous chunks re-sampled at full depth
# (AMBIGUOUS_GROUP_SAMPLE_RATIO, dictionary_encoding.rs:17)
AMBIGUOUS_SAMPLE_RATIO = 0.05
# screening pass samples at this multiple of `fraction`...
CHEAP_PASS_RATIO = 0.1
# ...floored so every chunk expects at least this many sampled values — the
# reference's per-group SAMPLE_ROWS semantics (cardinality.rs:29): an NDV
# estimate from a few hundred draws inflates the cardinality ratio right past
# the ambiguous window and mis-screens dictionary-friendly chunks as NoDict
SCREEN_TARGET_VALUES = 16_384


def lint(
    spark: SparkSession,
    df: DataFrame,
    fraction: float = 0.05,
    seed: int = 42,
    cfg: EncodeConfig | None = None,
    max_rows: int = MAX_CHUNK_ROWS,
    max_values: int = MAX_CHUNK_VALUES,
    two_pass: bool = True,
    full_depth: bool = False,
) -> DataFrame:
    """Sampled plan-only lint: decisions DataFrame, ordered by severity
    (lib.rs:44 sort_by_key(severity)).

    Two-pass by default, mirroring the reference's ambiguous-group strategy
    (dictionary_encoding.rs:155-172 + flow chart :29-68): a cheap screening
    pass — per-source stratified at max(fraction×0.1, enough rows that each
    chunk sees ~SCREEN_TARGET_VALUES sampled values) — classifies every
    chunk; chunks whose cardinality ratio is CLEAR (< 0.1 ⇒ dictionary,
    > 0.5 ⇒ no dictionary) keep the screening decision, and only a strided
    5% of the AMBIGUOUS chunks (ratio in (0.1, 0.5)) are re-sampled at the
    full `fraction` — the exact choose_sample_row_groups stride, computed as
    a Spark predicate so the ambiguous chunk list never reaches the driver.
    On a mostly-clear corpus the lint therefore moves ~10× fewer sampled
    rows than a uniform `fraction` sample while emitting the same
    prescriptions. (Driver-side state: one O(#sources) collect for the
    stratified fractions — sources are datasets, not rows.)

    Every decision row carries `sample_fraction` (the fraction its chunk was
    actually sampled at) so downstream size extrapolation (R2's absolute
    thresholds in prescription_from_decisions) stays unbiased across passes.
    """
    import math

    from pyspark.sql import functions as F

    from .select import DICT_ENABLE_RATIO, DICT_REJECT_RATIO

    cfg = cfg or EncodeConfig()
    mr = cfg.max_chunk_rows or max_rows
    mv = cfg.effective_max_values(max_values)

    def pass_at(sampled: DataFrame, buckets: DataFrame, fracs: dict[str, float],
                default_frac: float, only: DataFrame | None = None) -> DataFrame:
        chunked = assign_chunks(sampled, buckets)
        if only is not None:
            # filter BEFORE the chunk shuffle: only selected chunks' sampled
            # rows move; everything else is dropped at the scan
            chunked = chunked.join(F.broadcast(only), "chunk_id", "semi")

        def fn(t: pa.Table) -> pa.Table:
            # per-source fraction captured by closure: pyspark 4.1 infers the
            # UDF eval type from the signature — keep (pa.Table) -> pa.Table
            src = t.column("source")[0].as_py() if t.num_rows else ""
            return lint_chunk(t, cfg, fraction=fracs.get(src, default_frac), full_stats=full_depth)

        d = chunked.groupBy("chunk_id").applyInArrow(fn, LINT_SCHEMA)
        if fracs:
            mapping = F.create_map(*[F.lit(x) for kv in fracs.items() for x in kv])
            from .chunking import chunk_id_prefix

            src_col = chunk_id_prefix()
            frac_col = F.coalesce(mapping[src_col], F.lit(float(default_frac)))
        else:
            frac_col = F.lit(float(default_frac))
        return d.withColumn("sample_fraction", frac_col)

    if full_depth:
        # deterministic mode for the SQL oracle: every row, whole-stream
        # stats, chunks sorted in encode order — no sampling anywhere
        buckets = plan_buckets(df, mr, mv)
        decisions = pass_at(df, buckets, {}, 1.0)
    elif not two_pass:
        buckets = plan_buckets(df, mr, mv)
        decisions = pass_at(df.sample(fraction=fraction, seed=seed), buckets, {}, fraction)
    else:
        # one O(#sources) aggregate drives both the bucket plan and the
        # per-source screening fractions
        totals_df = df.groupBy("source").agg(
            F.count("*").alias("rows"), F.sum("n_tok").alias("values")
        ).localCheckpoint()
        # bucket counts come from THE shared formula (buckets_from_totals —
        # the same expression plan_buckets applies in the encode path), fed
        # from this pass's one O(#sources) aggregate: re-deriving the formula
        # in driver python would drift the moment either copy changed, and
        # lint chunk ids must match encode chunk ids
        buckets = buckets_from_totals(totals_df, mr, mv)
        nb = {r["source"]: r["nbuckets"] for r in buckets.collect()}
        totals = totals_df.collect()
        cheap_fracs = {}
        for r in totals:
            vpc = float(r["values"] or 0) / nb[r["source"]]
            f = fraction * CHEAP_PASS_RATIO
            if vpc > 0:
                f = max(f, SCREEN_TARGET_VALUES / vpc)
            cheap_fracs[r["source"]] = min(1.0, f)
        # localCheckpoint: the screening decisions are O(#chunks × #columns)
        # rows and get reused three times below
        cheap = pass_at(
            df.sampleBy("source", cheap_fracs, seed), buckets, cheap_fracs, fraction
        ).localCheckpoint()
        ambiguous = (F.col("cardinality_ratio") > DICT_ENABLE_RATIO) & (
            F.col("cardinality_ratio") < DICT_REJECT_RATIO
        )
        # sources whose screening pass already sampled at ≥ the deep fraction
        # gain nothing from a re-sample — for small-chunk sources the floor
        # pushes the screening fraction past `fraction`, and a deep pass at
        # the lower rate would override a better-sampled decision with a
        # noisier one
        deep_srcs = sorted(s for s, f in cheap_fracs.items() if f < fraction)
        from .chunking import chunk_id_prefix

        src_col = chunk_id_prefix()
        amb = (
            cheap.filter(ambiguous)
            .filter(src_col.isin(deep_srcs) if deep_srcs else F.lit(False))
            .select("chunk_id")
            .distinct()
        )
        n_amb = amb.count()
        if n_amb == 0:
            decisions = cheap
        else:
            k = max(1, math.ceil(n_amb * AMBIGUOUS_SAMPLE_RATIO))
            # deterministic ~k-of-n spread via a hash threshold — a pure
            # per-row predicate, no global row_number window (which would
            # funnel every ambiguous chunk id through ONE task at
            # millions-of-chunks scale). The hash-min chunk is unioned in so
            # the deep pass can never select zero chunks.
            hash_pred = F.pmod(F.xxhash64("chunk_id"), F.lit(n_amb)) < F.lit(k)
            first = amb.orderBy(F.xxhash64("chunk_id")).limit(1)
            sel = amb.filter(hash_pred).unionByName(first).distinct()
            deep_fracs = {s: min(1.0, fraction) for s in deep_srcs}
            deep = pass_at(
                df.sampleBy("source", deep_fracs, seed + 1),
                buckets, deep_fracs, fraction, only=sel,
            ).localCheckpoint()
            # replace screening rows only for chunks the deep pass actually
            # covered: a tiny chunk can draw ZERO rows in the deep sample,
            # and anti-joining on `sel` would silently drop its decisions
            covered = deep.select("chunk_id").distinct()
            decisions = cheap.join(F.broadcast(covered), "chunk_id", "left_anti").unionByName(deep)
    rank = F.when(F.col("severity") == "error", 2).when(F.col("severity") == "warning", 1).otherwise(0)
    return decisions.orderBy(rank.desc(), "chunk_id", "column")


def prescription_from_decisions(decisions: DataFrame, scale: float = 1.0) -> Prescription:
    """Collapse per-chunk decisions to a per-column prescription: majority
    codec per column (the reference's most_frequent property inference,
    fix.rs:196-211) plus the R2 outer-codec majority vote (outer_policy.py),
    emitted in the same `set column …` DSL.

    Sampled body bytes are rescaled to full-data magnitudes so the
    reference's absolute size thresholds (8 MB column floor, 4 MB speed
    threshold, …) see full-corpus numbers: decisions from `lint` carry their
    own per-chunk `sample_fraction` (the two passes sample at different
    depths) and are divided by it automatically; `scale` multiplies on top
    (useful to emulate a larger corpus in tests, default 1.0 — callers no
    longer pass 1/fraction). Both votes are Spark aggregates: one row per
    column reaches the driver."""
    from pyspark.sql import Window, functions as F

    from . import outer_policy as OP
    from .plan import Directive

    w = Window.partitionBy("column").orderBy(F.desc("count"), "codec")
    majority = (
        decisions.groupBy("column", "codec")
        .count()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("column", "codec")
        .collect()
    )
    rx = plan_from_decisions([{"column": r["column"], "codec": r["codec"]} for r in majority])

    b = F.col("body_bytes") * F.lit(float(scale))
    if "sample_fraction" in decisions.columns:
        b = b / F.col("sample_fraction")
    vote = (
        F.when(F.col("outer_ratio") > OP.RATIO_SKIP, F.lit("none"))
        .when(b > OP.SPEED_THRESHOLD_BYTES, F.lit("lz4"))
        .otherwise(F.lit("zstd"))
    )
    agg = (
        decisions.groupBy("column")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(b).alias("total_bytes"),
            F.max(b).alias("max_chunk_bytes"),
            (F.sum(b * F.col("outer_ratio")) / F.sum(b)).alias("weighted_ratio"),
            F.sum(F.when(vote == "lz4", 1).otherwise(0)).alias("lz4_votes"),
            F.sum(F.when(vote == "zstd", 1).otherwise(0)).alias("zstd_votes"),
        )
        .collect()
    )
    for r in sorted(agg, key=lambda r: r["column"]):
        kind, is_text = OP.COLUMN_KINDS.get(r["column"], (None, None))
        v = OP.decide(
            r["n_chunks"],
            float(r["total_bytes"] or 0),
            float(r["max_chunk_bytes"] or 0),
            float(r["weighted_ratio"] if r["weighted_ratio"] is not None else 1.0),
            r["lz4_votes"],
            r["zstd_votes"],
            column=r["column"],
            kind=kind,
            is_text=is_text,
        )
        if v is not None:
            rx.directives.append(Directive("column", r["column"], "compression", v))

    # R10 vector-embedding page-size (vector_embedding.rs:19-76): a list
    # extra averaging ≥ 64 values/row gets the small-pages directive — a
    # per-column data_page_size_limit the encoder turns into intra-chunk
    # FLAG_BLOCKED blocks, so point lookups decode O(doc) bytes. Fanout is
    # read off the decisions' own (sample_values, sample_rows); a scalar
    # column can never reach 64× rows, so the threshold implies list-ness.
    # `tokens` is excluded by design: its flat stream is offset-addressed
    # through n_tok, not block-indexed (engine divergence, documented).
    from .plan import R10_PAGE_BYTES

    fan = (
        decisions.filter(F.col("column") != "tokens")
        .groupBy("column")
        .agg(
            (
                F.sum("sample_values")
                / F.greatest(F.sum("sample_rows"), F.lit(1))
            ).alias("avg_fanout")
        )
        .collect()
    )
    for r in sorted(fan, key=lambda r: r["column"]):
        if r["avg_fanout"] is not None and r["avg_fanout"] >= 64:
            rx.directives.append(
                Directive("column", r["column"], "data_page_size_limit", str(R10_PAGE_BYTES))
            )

    # R1 growth flow (dictionary_encoding.rs:155-240): where dictionary wins
    # but its table would overflow the 2 MB starting page, grow the page limit
    # (2 MB doubling ≤16 MB); if even 16 MB can't hold it, shrink chunks
    # instead. NDV-based payloads don't scale linearly with the sample, so
    # the sampled maximum is used as-is (growth is by powers of two anyway).
    from .select import (
        DICT_PAGE_SIZE_MAX,
        DICT_PAGE_SIZE_START,
        suggested_dictionary_page_size_limit,
        suggested_max_chunk_rows,
    )

    dict_cols = {
        r["column"]
        for r in majority
        if r["codec"] in ("dict", "str_dict")
    }
    if dict_cols:
        # payload estimates are full-chunk magnitudes (lint_chunk extrapolates
        # stats), so the shrink's current-rows input must be full-chunk too —
        # raw sample_rows would shrink ~fraction× more than needed
        rows_expr = F.col("sample_rows").cast("double")
        if "sample_fraction" in decisions.columns:
            rows_expr = rows_expr / F.col("sample_fraction")
        pay = (
            decisions.filter(F.col("column").isin(list(dict_cols)))
            .groupBy("column")
            .agg(F.max("dict_payload_bytes").alias("payload"), F.max(rows_expr).alias("rows"))
            .collect()
        )
        # a file-level max_chunk_rows shrink must fold MIN across columns:
        # apply()'s last-wins would otherwise keep the lexicographically
        # last overflower's (looser) shrink and leave the tighter column's
        # dictionary still over the page cap at encode time
        min_shrink: int | None = None
        for r in sorted(pay, key=lambda r: r["column"]):
            payload = int(r["payload"] or 0)
            if payload <= DICT_PAGE_SIZE_START:
                continue
            limit = suggested_dictionary_page_size_limit(payload)
            if limit is not None:
                rx.directives.append(
                    Directive("column", r["column"], "dictionary_page_size_limit", str(limit))
                )
            else:
                shrink = suggested_max_chunk_rows(int(r["rows"]), payload, DICT_PAGE_SIZE_MAX)
                min_shrink = shrink if min_shrink is None else min(min_shrink, shrink)
                rx.directives.append(
                    Directive("column", r["column"], "dictionary_page_size_limit", str(DICT_PAGE_SIZE_MAX))
                )
        if min_shrink is not None:
            rx.directives.append(Directive("file", None, "max_chunk_rows", str(min_shrink)))
    return rx


def lint_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    """R1's EVIDENCE tier over an already-encoded table (reference
    dictionary_encoding.rs:274-310: classify Dict/Fallback/NoDict from the
    ACTUAL page-header encodings before any sampling): the engine's stored
    chunk metrics carry each column chunk's real codec and exact-or-scaled
    NDV, so the classification reads evidence, not samples — a metrics-only
    scan, zero payload bytes touched.

    Per (chunk, column) with an int-family codec:
    - stored codec dict + cardinality ratio > 0.5      → `disable-dictionary`
      (warning: the table outgrew its dictionary; reference flow :29-68)
    - stored codec non-dict + ratio < 0.1              → `enable-dictionary`
      (warning: R1's enable threshold says the table would pay)
    - stored dict whose est. table > 16 MB             → `dictionary-overflow`
      (suggestion: shrink chunks / raise page limit — the Fallback arm)
    - otherwise                                        → `ok` (suggestion)

    Chunks written with `statistics none` have blanked NDV (distinct_est=0
    with values present) and classify as `no-evidence` — the reference's
    fall-back-to-sampling arm; run the sampled `lint` on the decoded rows
    for those. Decision rows are column-located like lint()'s.

    A COMPRESSION tier (round 6) rides the same metrics scan — the R2/R3
    analogs over stored evidence (compression_codec.rs:68-85 conditions
    applied to what the table actually stores, not samples):
    - stored outer 'none' whose recorded `outer_trial_ratio` (the bounded
      zstd tail-sample trial the encoder ran at write time) is below the
      keep threshold                         → `enable-compression` (warning)
    - stored outer ≠ 'none' whose whole-pipeline ratio encoded/raw > 0.95
      (the general-purpose layer isn't buying the 5% R3 demands — only a
      FORCED outer can store this shape; auto keeps a codec only when it
      pays)                                  → `disable-compression` (warning)
    Compression rows are EXTRA rows (a column can carry both a dictionary
    and a compression verdict); their `cardinality_ratio` column carries
    the byte/trial ratio that fired the rule. Pre-round-6 tables have no
    stored trial → no enable verdicts (no evidence, never a guess)."""
    from pyspark.sql import functions as F

    from .codecs.container import OUTER_KEEP_RATIO
    from .decode_job import dedup_attempts, read_encoded
    from .encode_job import column_metrics
    from .outer_policy import RATIO_SKIP
    from .select import DICT_ENABLE_RATIO, DICT_PAGE_SIZE_MAX, DICT_REJECT_RATIO

    m = column_metrics(dedup_attempts(read_encoded(spark, out_dir)))
    int_kind = (
        F.col("dtype").isin(
            "int", "bigint", "smallint", "tinyint",
            "timestamp_ntz", "timestamp", "date", "time(6)",
            # scalar floats ride the int-carrier too (bit pattern): dict is
            # a legal stored codec for them, so they get verdicts like
            # their array<float|double> forms always did
            "float", "double",
        )
        | F.col("dtype").startswith("array<")
        | F.col("dtype").startswith("decimal")  # unscaled-int64 carrier
    )
    is_dict = F.col("codec") == "dict"
    # list-granularity columns (tokens / array extras) count VALUES in
    # n_values but null ROWS in null_count — null rows contribute zero
    # values already, so the denominator must not subtract them (mixed
    # units; round-4 advice). Their all-null signature is n_values == 0
    # with null rows present.
    is_list = F.col("dtype").startswith("array<")
    all_null = F.when(
        is_list, (F.col("n_values") == 0) & (F.col("null_count") > 0)
    ).otherwise((F.col("n_values") == F.col("null_count")) & (F.col("n_values") > 0))
    empty = F.col("n_values") == 0
    denom = F.when(is_list, F.col("n_values")).otherwise(
        F.col("n_values") - F.col("null_count")
    )
    has_stats = (F.col("distinct_est") > 0) | all_null | empty
    ratio = F.col("distinct_est") / F.greatest(denom, F.lit(1))
    # estimate_dictionary_payload_bytes: entry width follows the stored
    # dtype — 16 B for decimal128 (precision > 18), 8 B for the wide int
    # family, 4 B otherwise (a 4 B estimate fires the overflow arm 2× late
    # for bigint/timestamp extras)
    deci_precision = F.regexp_extract(F.col("dtype"), r"decimal\((\d+),", 1)
    entry_bytes = F.when(
        (deci_precision != "") & (deci_precision.cast("int") > 18), F.lit(16)
    ).when(
        F.col("dtype").isin(
            "bigint", "timestamp_ntz", "timestamp", "time(6)", "double",
            "array<bigint>", "array<timestamp_ntz>", "array<timestamp>",
            "array<time(6)>", "array<double>",
        )
        | F.col("dtype").startswith("decimal")
        | F.col("dtype").startswith("array<decimal"),
        F.lit(8),
    ).otherwise(F.lit(4))
    table_bytes = F.col("distinct_est") * entry_bytes * 1.25
    rule = (
        F.when(all_null | empty, F.lit("ok"))
        .when(~has_stats, F.lit("no-evidence"))
        .when(is_dict & (ratio > DICT_REJECT_RATIO), F.lit("disable-dictionary"))
        .when(~is_dict & (ratio < DICT_ENABLE_RATIO), F.lit("enable-dictionary"))
        .when(is_dict & (table_bytes > DICT_PAGE_SIZE_MAX), F.lit("dictionary-overflow"))
        .otherwise(F.lit("ok"))
    )
    base = m.filter(int_kind).select(
        "chunk_id",
        "column",
        "codec",
        rule.alias("rule"),
        F.when(rule.isin("disable-dictionary", "enable-dictionary"), F.lit("warning"))
        .otherwise(F.lit("suggestion"))
        .alias("severity"),
        F.round(ratio, 6).alias("cardinality_ratio"),
        F.col("distinct_est"),
        F.col("n_values"),
        F.lit("column").alias("location"),
    )
    # compression tier: flagged rows only (every column kind qualifies —
    # the outer layer is codec-agnostic), unioned under the same schema
    comp_rule = F.when(
        (F.col("outer") != "none")
        & (F.col("raw_bytes") > 0)
        & (F.col("encoded_bytes") > RATIO_SKIP * F.col("raw_bytes")),
        F.lit("disable-compression"),
    ).when(
        (F.col("outer") == "none")
        & (F.col("outer_trial_ratio") > 0)
        & (F.col("outer_trial_ratio") < OUTER_KEEP_RATIO),
        F.lit("enable-compression"),
    )
    comp = m.filter(comp_rule.isNotNull()).select(
        "chunk_id",
        "column",
        "codec",
        comp_rule.alias("rule"),
        F.lit("warning").alias("severity"),
        F.round(
            F.when(F.col("outer") == "none", F.col("outer_trial_ratio")).otherwise(
                F.col("encoded_bytes") / F.greatest(F.col("raw_bytes"), F.lit(1))
            ),
            6,
        ).alias("cardinality_ratio"),
        F.col("distinct_est"),
        F.col("n_values"),
        F.lit("column").alias("location"),
    )
    return base.unionByName(comp)


def lint_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    """Invariant lint over an encoded table: `error`-severity decisions for
    chunks whose lineage row is missing/incomplete or whose recorded
    fingerprint disagrees with the encoded metrics (the R8
    missing-page-statistics analog on the engine's own format,
    page_statistics.rs:13-51; Severity::Error, diagnostic.rs:8-12). Rows are
    chunk-located — the Location::RowGroup analog (diagnostic.rs:37-41)."""
    from pyspark.sql import functions as F

    enc = (
        spark.read.parquet(f"{out_dir}/encoded")
        .select("chunk_id", "input_fingerprint")
        .distinct()
    )
    lin = (
        spark.read.parquet(f"{out_dir}/lineage")
        .filter(F.col("status") == "complete")
        .select("chunk_id", F.col("input_fingerprint").alias("lin_fp"))
        .distinct()
    )
    j = enc.join(lin, "chunk_id", "left")
    return j.select(
        "chunk_id",
        F.when(F.col("lin_fp").isNull(), F.lit("lineage-missing"))
        .when(F.col("lin_fp") != F.col("input_fingerprint"), F.lit("lineage-fingerprint-mismatch"))
        .otherwise(F.lit("ok"))
        .alias("rule"),
    ).select(
        "chunk_id",
        "rule",
        F.when(F.col("rule") == "ok", F.lit("suggestion")).otherwise(F.lit("error")).alias("severity"),
        F.lit("chunk").alias("location"),
    )


def has_warnings_or_errors(decisions: DataFrame) -> bool:
    """Gate for CI-style lint runs (reference has_warnings_or_errors,
    lib.rs:48-52; the CLI exits 1 on it, cli/main.rs:131-133)."""
    from pyspark.sql import functions as F

    return (
        decisions.filter(F.col("severity").isin("warning", "error")).limit(1).count() > 0
    )
