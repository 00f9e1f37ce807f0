"""Plan-applied encode: FIXTURES.md invariant 4 — re-encoding with a
1-column prescription changes that column and leaves others' codecs unchanged
(reference e2e analog: fix.rs:276-305)."""

import pytest
from pyspark.sql import functions as F

from tokenlake import encode_job
from tokenlake.plan import Prescription
from tokenlake.schema import SEQUENCES_SPARK_SCHEMA, generate_sequences


@pytest.fixture(scope="module")
def small_df(spark):
    tbl = generate_sequences(scale=0.01, profiles=["lowcard", "sorted_ts"], skew=False)
    df = spark.createDataFrame(tbl.to_pandas(), schema=SEQUENCES_SPARK_SCHEMA)
    df.cache().count()
    return df


def codec_map(spark, out):
    enc = encode_job.column_metrics(spark.read.parquet(f"{out}/encoded"))
    return {
        (r["chunk_id"], r["column"]): r["codec"]
        for r in enc.select("chunk_id", "column", "codec").collect()
    }


def test_prescription_changes_only_targeted_column(spark, small_df, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    encode_job.run(spark, small_df, out_a)
    base = codec_map(spark, out_a)

    cfg = Prescription.parse("set column tokens encoding for").apply()
    encode_job.run(spark, small_df, out_b, cfg=cfg)
    changed = codec_map(spark, out_b)

    assert set(base) == set(changed)
    for (chunk, col), codec in changed.items():
        if col == "tokens":
            assert codec == "for"
        else:
            assert codec == base[(chunk, col)], f"untouched {col} changed codec"


def test_dictionary_false_disables_dict(spark, small_df, tmp_path):
    out = str(tmp_path / "nodict")
    cfg = Prescription.parse("set column tokens dictionary false").apply()
    encode_job.run(spark, small_df, out, cfg=cfg)
    enc = encode_job.column_metrics(spark.read.parquet(f"{out}/encoded"))
    codecs = {
        r["codec"]
        for r in enc.filter(
            (F.col("column") == "tokens") & F.col("chunk_id").startswith("lowcard")
        ).collect()
    }
    assert "dict" not in codecs


def test_file_outer_none_respected(spark, small_df, tmp_path):
    out = str(tmp_path / "nozlib")
    cfg = Prescription.parse("set file compression none").apply()
    encode_job.run(spark, small_df, out, cfg=cfg)
    enc = encode_job.column_metrics(spark.read.parquet(f"{out}/encoded"))
    assert enc.filter(F.col("outer") != "none").count() == 0
