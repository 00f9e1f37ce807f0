"""S1 source dispatch: parquet path equivalence + the environment-gated
iceberg branch (no Iceberg runtime jar ships in this sandbox, so the
contract under test is the actionable error, not a fake metadata parser)."""

import pyarrow.parquet as pq
import pytest

from tokenlake.io_sources import read_sequences
from tokenlake.schema import generate_sequences


def test_parquet_path_equivalent(spark, tmp_path):
    p = str(tmp_path / "seq")
    import os

    os.makedirs(p)
    pq.write_table(generate_sequences(scale=0.005), f"{p}/s.parquet")
    a = read_sequences(spark, p).orderBy("doc_id").collect()
    b = spark.read.parquet(p).orderBy("doc_id").collect()
    assert a == b and len(a) > 0


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown source format"):
        read_sequences(spark, "/x", format="orc")


def test_snapshot_requires_iceberg(spark):
    with pytest.raises(ValueError, match="iceberg-format feature"):
        read_sequences(spark, "/x", snapshot_id=7)


def test_iceberg_gated_error_names_the_fix(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_sequences(spark, "db.sequences", format="iceberg")
