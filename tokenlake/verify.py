"""Bit-identical verification: decoded vs source, per row (north_rule).

The one relational join in the engine (SURVEY.md §2.8): decoded ⋈ source on
doc_id with array equality on tokens — the analog of the leaderboard's
post-rewrite schema-equality assertion (reference
src/parquet-linter-leaderboard/src/main.rs:325-333), strengthened to value
equality per row. Expressed declaratively so Catalyst plans the join (sort-
merge on doc_id; both sides are big).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def verify_by_hash(source: DataFrame, decoded: DataFrame) -> dict:
    """Scale-path verification: no join. Each side is reduced to
    (count, sum(xxhash64(doc_id, tokens, n_tok, source))) per source — two
    scans and a tiny aggregate instead of shuffling both full datasets.
    A single differing row flips the sum with probability 1 - 2^-64; use
    verify_bit_identical for the exact per-row certificate.

    At 10^12 rows this is the only verification shape that stays one pass:
    the full-outer join variant shuffles 2× the corpus.
    """
    def digest(df: DataFrame) -> DataFrame:
        # decimal(38,0) sum: 10^12 rows × |2^63| stays within 38 digits, and
        # never trips the ANSI long-overflow that sum(bigint) would
        h = F.xxhash64("doc_id", "tokens", "n_tok", "source").cast("decimal(38,0)")
        return df.groupBy("source").agg(
            F.count("*").alias("rows"), F.sum(h).alias("h")
        )

    s = {r["source"]: (r["rows"], r["h"]) for r in digest(source).collect()}
    d = {r["source"]: (r["rows"], r["h"]) for r in digest(decoded).collect()}
    mismatched = sorted(k for k in s.keys() | d.keys() if s.get(k) != d.get(k))
    rows = sum(r for r, _ in s.values())
    return {
        "rows": rows,
        "sources": len(s),
        "mismatched_sources": mismatched,
        "pass": not mismatched,
    }


def verify_bit_identical(source: DataFrame, decoded: DataFrame) -> dict:
    """Returns {'rows': n, 'matched': m, 'missing': k, 'mismatched': j}.

    A row matches iff doc_id joins AND tokens arrays are element-wise equal
    AND n_tok and source agree. One job: full-outer join + conditional agg.
    """
    s = source.select(
        F.col("doc_id"),
        F.col("tokens").alias("s_tokens"),
        F.col("n_tok").alias("s_n_tok"),
        F.col("source").alias("s_source"),
        F.lit(1).alias("s_present"),  # existence marker: a NULL tokens value
        # must not read as "row absent" after the full-outer join
    )
    d = decoded.select(
        F.col("doc_id"),
        F.col("tokens").alias("d_tokens"),
        F.col("n_tok").alias("d_n_tok"),
        F.col("source").alias("d_source"),
        F.lit(1).alias("d_present"),
    )
    j = s.join(d, "doc_id", "full_outer")
    agg = j.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("s_present").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(F.when(F.col("d_present").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(
            F.when(
                F.col("s_present").isNotNull()
                & F.col("d_present").isNotNull()
                & F.col("s_tokens").eqNullSafe(F.col("d_tokens"))
                & F.col("s_n_tok").eqNullSafe(F.col("d_n_tok"))
                & F.col("s_source").eqNullSafe(F.col("d_source")),
                1,
            ).otherwise(0)
        ).alias("matched"),
    ).first()
    rows = agg["rows"]
    return {
        "rows": rows,
        "matched": agg["matched"],
        "missing": agg["missing"],
        "extra": agg["extra"],
        "mismatched": rows - agg["matched"] - agg["missing"] - agg["extra"],
        "pass": rows == agg["matched"],
    }
