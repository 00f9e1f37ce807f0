"""tokenlake — PySpark-native per-column lightweight-compression engine.

A from-scratch Spark-first re-expression of the capabilities of
XiangpengHao/parquet-linter (reference at /root/reference, read-only): per-
column statistics, sampled cost-based codec auto-selection (the linter's rule
thresholds become the cost model's priors), a prescription DSL, and — unlike
the reference, which delegates encoding to arrow-rs — a full encode/decode
path over Iceberg-shaped tables of pre-tokenized training sequences
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string).

Architecture: DataFrame-declarative everywhere Catalyst can help (stats
aggregation, rule predicates, chunk planning, verification joins); Arrow-
vectorized applyInArrow only for the encode/decode kernels themselves.
"""

__version__ = "0.1.0"
