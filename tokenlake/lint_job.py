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

from .chunking import MAX_CHUNK_ROWS, MAX_CHUNK_VALUES, assign_chunks, plan_buckets
from .plan import EncodeConfig, Prescription, plan_from_decisions
from .select import estimate_dictionary_payload_bytes, select_codec
from .stats import compute_chunk_stats

LINT_SCHEMA = (
    "chunk_id string, column string, codec string, rule string, "
    "severity string, est_bytes long, sample_rows long, sample_values long, "
    "cardinality_ratio double, run_ratio double, sorted_frac double, "
    "body_bytes long, outer_ratio double, dict_payload_bytes long"
)

_OUTER_TRIAL_BYTES = 1 << 16  # bounded zstd-3 trial sample per chunk


def lint_chunk(t: pa.Table, cfg: EncodeConfig | None = None) -> pa.Table:
    """Stats + selection over one chunk's sampled rows → decision rows."""
    cfg = cfg or EncodeConfig()
    t = t.combine_chunks()
    chunk_id = t.column("chunk_id")[0].as_py()
    n_rows = t.num_rows
    toks = t.column("tokens").chunk(0) if t.column("tokens").num_chunks else pa.array([], pa.list_(pa.int32()))
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    lens = t.column("n_tok").to_numpy().astype(np.int32)

    rows = []
    for column, values, nv in (("tokens", flat, len(flat)), ("n_tok", lens, n_rows)):
        st = compute_chunk_stats(values, n_rows)
        d = select_codec(
            values, st, forced=cfg.overrides.get(column),
            allow_dict=f"!dict:{column}" not in cfg.overrides,
        )
        plain_bytes = 4 * max(nv, 1)
        saving = 1.0 - d.est_bytes / plain_bytes
        # Severity ordering mirrors diagnostic.rs:8-12: big wins are warnings
        # (you are leaving >50% on the table), marginal ones suggestions;
        # `error` is reserved for broken invariants (lint_lineage).
        severity = "warning" if saving > 0.5 else "suggestion"
        # R2 inputs: real sampled encode body + bounded zstd-3 trial ratio
        # (the reference samples one row group, column_context.rs:543)
        from .codecs import encode_int_column
        from .codecs.container import _outer_compress

        body = encode_int_column(values, d.codec, outer="none")
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
                "cardinality_ratio": float(st.cardinality_ratio),
                "run_ratio": float(st.run_ratio),
                "sorted_frac": float(st.sorted_frac),
                "body_bytes": len(body),
                "outer_ratio": float(outer_ratio),
                "dict_payload_bytes": int(estimate_dictionary_payload_bytes(st)),
            }
        )
    return pa.Table.from_pylist(rows)


def lint(
    spark: SparkSession,
    df: DataFrame,
    fraction: float = 0.05,
    seed: int = 42,
    cfg: EncodeConfig | None = None,
    max_rows: int = MAX_CHUNK_ROWS,
    max_values: int = MAX_CHUNK_VALUES,
) -> DataFrame:
    """Sampled plan-only lint: decisions DataFrame, ordered by severity
    (lib.rs:44 sort_by_key(severity))."""
    from pyspark.sql import functions as F

    cfg = cfg or EncodeConfig()
    buckets = plan_buckets(df, cfg.max_chunk_rows or max_rows, cfg.effective_max_values(max_values))
    sampled = df.sample(fraction=fraction, seed=seed)
    chunked = assign_chunks(sampled, buckets)

    def fn(t: pa.Table) -> pa.Table:
        return lint_chunk(t, cfg)

    decisions = chunked.groupBy("chunk_id").applyInArrow(fn, LINT_SCHEMA)
    rank = F.when(F.col("severity") == "error", 2).when(F.col("severity") == "warning", 1).otherwise(0)
    return decisions.orderBy(rank.desc(), "chunk_id", "column")


def prescription_from_decisions(decisions: DataFrame, scale: float = 1.0) -> Prescription:
    """Collapse per-chunk decisions to a per-column prescription: majority
    codec per column (the reference's most_frequent property inference,
    fix.rs:196-211) plus the R2 outer-codec majority vote (outer_policy.py),
    emitted in the same `set column …` DSL.

    `scale` rescales sampled body bytes to full-data bytes (pass
    1/sample_fraction when the decisions come from a sampled lint) so the
    reference's absolute size thresholds (8 MB column floor, 4 MB speed
    threshold, …) see full-corpus magnitudes. Both votes are Spark
    aggregates: one row per column reaches the driver."""
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
        v = OP.decide(
            r["n_chunks"],
            float(r["total_bytes"] or 0),
            float(r["max_chunk_bytes"] or 0),
            float(r["weighted_ratio"] if r["weighted_ratio"] is not None else 1.0),
            r["lz4_votes"],
            r["zstd_votes"],
        )
        if v is not None:
            rx.directives.append(Directive("column", r["column"], "compression", v))

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
        pay = (
            decisions.filter(F.col("column").isin(list(dict_cols)))
            .groupBy("column")
            .agg(F.max("dict_payload_bytes").alias("payload"), F.max("sample_rows").alias("rows"))
            .collect()
        )
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
                rx.directives.append(Directive("file", None, "max_chunk_rows", str(shrink)))
                rx.directives.append(
                    Directive("column", r["column"], "dictionary_page_size_limit", str(DICT_PAGE_SIZE_MAX))
                )
    return rx


def lint_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    """Invariant lint over an encoded table: `error`-severity decisions for
    chunks whose lineage row is missing/incomplete or whose recorded
    fingerprint disagrees with the encoded metrics (the R8
    missing-page-statistics analog on the engine's own format,
    page_statistics.rs:13-51; Severity::Error, diagnostic.rs:8-12)."""
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
    )


def has_warnings_or_errors(decisions: DataFrame) -> bool:
    """Gate for CI-style lint runs (reference has_warnings_or_errors,
    lib.rs:48-52; the CLI exits 1 on it, cli/main.rs:131-133)."""
    from pyspark.sql import functions as F

    return (
        decisions.filter(F.col("severity").isin("warning", "error")).limit(1).count() > 0
    )
