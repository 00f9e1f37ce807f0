"""Zoned TIMESTAMP (Spark's default timestamp type, TIMESTAMP_LTZ) in the
generic column registry: stored as the µs-since-epoch INSTANT on the wide
int carrier (dtype code 17), restored as timestamp[us, tz=UTC]. Spark
treats TIMESTAMP as an instant — the display zone is a session property —
so the roundtrip is semantically lossless regardless of the producer's
wall zone (reference analyzes zoned Timestamp physical columns the same
way it does ntz, column_context.rs:215-291)."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pytest

from tokenlake.codecs.container import (
    DT_TIMESTAMP_TZ_US,
    DT_TIMESTAMP_US,
    decode_column,
    dtype_of_arrow,
    encode_any_column,
    encode_list_column,
)

UTC = dt.timezone.utc
VALS = [
    dt.datetime(2026, 8, 17, 12, 0, 0, 123456, tzinfo=UTC),
    None,
    dt.datetime(1999, 1, 1, tzinfo=UTC),
    dt.datetime(2026, 8, 17, 12, 0, 0, 123457, tzinfo=UTC),
]


def _tz_array(zone: str) -> pa.Array:
    # pa.array() from a python list mishandles aware datetimes on this
    # pyarrow (stores the wall clock, as_py() != input); the pandas path
    # converts instants correctly, matching what Spark's JVM writer sends
    s = pd.Series(pd.to_datetime(VALS, utc=True)).dt.tz_convert(zone)
    return pa.Array.from_pandas(s, type=pa.timestamp("us", tz=zone))


def test_cli_bound_parsing():
    from tokenlake.cli import _parse_bound

    assert _parse_bound("42") == 42
    assert _parse_bound("2026-08-17") == dt.date(2026, 8, 17)
    assert _parse_bound("12:34:56") == dt.time(12, 34, 56)
    assert _parse_bound("2026-08-17T12:00:00+00:00") == dt.datetime(
        2026, 8, 17, 12, tzinfo=UTC
    )
    assert _parse_bound("2026-08-17 12:00:00") == dt.datetime(2026, 8, 17, 12)


def test_zone_bound_mismatches_fail_loudly():
    """An aware bound on a zoneless column (and vice-versa-adjacent cases)
    must raise, not silently shift the scan window."""
    from tokenlake.decode_job import _temporal_carrier

    aware = dt.datetime(2026, 8, 17, 12, tzinfo=UTC)
    with pytest.raises(ValueError, match="zoneless wall time"):
        _temporal_carrier("timestamp_ntz", aware)
    with pytest.raises(ValueError, match="zoneless"):
        _temporal_carrier("time(6)", dt.time(12, 0, tzinfo=UTC))
    # zoned column: aware and the naive-as-UTC convention agree exactly
    assert _temporal_carrier("timestamp", aware) == _temporal_carrier(
        "timestamp", aware.replace(tzinfo=None)
    )


def test_dtype_dispatch_tz_vs_ntz():
    assert dtype_of_arrow(pa.timestamp("us", tz="UTC")) == DT_TIMESTAMP_TZ_US
    assert dtype_of_arrow(pa.timestamp("us")) == DT_TIMESTAMP_US
    with pytest.raises(ValueError, match="µs precision"):
        dtype_of_arrow(pa.timestamp("ns", tz="UTC"))


def test_roundtrip_utc_with_nulls():
    out = decode_column(encode_any_column(_tz_array("UTC"), "for", outer="auto"))
    assert out.type == pa.timestamp("us", tz="UTC")
    assert out.to_pylist() == VALS


def test_producer_zone_normalizes_to_same_instants():
    """A table written from New York and one written from UTC must store
    byte-identical carriers and decode to equal instants."""
    ny = decode_column(encode_any_column(_tz_array("America/New_York"), "delta"))
    utc = decode_column(encode_any_column(_tz_array("UTC"), "delta"))
    assert ny.to_pylist() == utc.to_pylist() == VALS


def test_list_of_zoned_timestamps():
    la = pa.array(
        [[v for v in VALS if v], None, []],
        pa.list_(pa.timestamp("us", tz="UTC")),
    )
    out = decode_column(encode_list_column(la, "delta"))
    assert out.cast(la.type).to_pylist() == la.to_pylist()


def test_spark_roundtrip_and_zone_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from tokenlake import decode_job, encode_job
    from tokenlake.schema import generate_sequences

    df = (
        spark.createDataFrame(generate_sequences(scale=0.002).to_pandas())
        .withColumn(
            "seen_at",
            F.when(
                F.xxhash64("doc_id") % 7 == 0, F.lit(None).cast("timestamp")
            ).otherwise(
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.abs(F.xxhash64("doc_id") % 86400)
                )
            ),
        )
    )
    out = str(tmp_path / "enc")
    encode_job.run(spark, df, out, max_rows=512)
    enc = decode_job.read_encoded(spark, out)

    # metrics carry the zoned DDL, distinct from ntz
    m = encode_job.column_metrics(enc).filter(F.col("column") == "seen_at")
    assert m.select("dtype").distinct().collect()[0][0] == "timestamp"

    dec = decode_job.decode(spark, out)
    got = {r["doc_id"]: r["seen_at"] for r in dec.select("doc_id", "seen_at").collect()}
    want = {r["doc_id"]: r["seen_at"] for r in df.select("doc_id", "seen_at").collect()}
    assert got == want and any(v is None for v in want.values())

    # zone-map range scan with timezone-aware datetime bounds: every
    # in-range row comes back; chunk pruning must not drop any
    lo = dt.datetime.fromtimestamp(1_700_000_000 + 3600, tz=UTC)
    hi = dt.datetime.fromtimestamp(1_700_000_000 + 7200, tz=UTC)
    scanned = decode_job.scan_value_range(spark, out, "seen_at", lo, hi)
    # the filter side must compare instants (unix_micros), not session-zone
    # literals — otherwise a non-UTC caller session diverges from pruning
    assert "unix_micros" in scanned._jdf.queryExecution().analyzed().toString()
    expect = df.filter((F.col("seen_at") >= F.lit(lo)) & (F.col("seen_at") <= F.lit(hi)))
    assert sorted(r["doc_id"] for r in scanned.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in expect.select("doc_id").collect()
    )
    assert expect.count() > 0

    # the one failure mode this dtype introduces: zoned and naive share the
    # same int64 carrier, so a silent ntz append into a zoned column would
    # shift semantics with no byte-level symptom — the per-column dtype
    # guard must refuse it
    ntz = df.withColumn("seen_at", F.col("seen_at").cast("timestamp_ntz"))
    with pytest.raises(ValueError, match="stored as 'timestamp'"):
        encode_job.run(spark, ntz.limit(10), out, salt="b1")
