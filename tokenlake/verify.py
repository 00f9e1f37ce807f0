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
    )
    d = decoded.select(
        F.col("doc_id"),
        F.col("tokens").alias("d_tokens"),
        F.col("n_tok").alias("d_n_tok"),
        F.col("source").alias("d_source"),
    )
    j = s.join(d, "doc_id", "full_outer")
    agg = j.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("s_tokens").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(F.when(F.col("d_tokens").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(
            F.when(
                F.col("s_tokens").isNotNull()
                & F.col("d_tokens").isNotNull()
                & (F.col("s_tokens") == F.col("d_tokens"))
                & (F.col("s_n_tok") == F.col("d_n_tok"))
                & (F.col("s_source") == F.col("d_source")),
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
