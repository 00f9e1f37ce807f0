"""Structured Streaming ingest: continuously encode arriving sequence files.

The reference is batch-only (SURVEY.md §2.8: no streaming operators), but a
10^12-sequence corpus is ingested continuously, so the engine exposes the
encode path as a streaming sink. Spark shape:

    readStream(parquet dir, fixed schema)
      → foreachBatch(encode_job.run)       # the SAME chunked encode path
      → encoded/ + lineage/ append

Exactly-once story, two independent layers:
- Spark's streaming checkpoint makes each source file part of exactly one
  micro-batch, and re-runs a failed batch under the same batch_id;
- within a batch, chunk ids are salted with the batch_id
  (`source#b<batch_id>#<bucket>`) and the lineage fingerprints make the
  re-run of a half-committed batch skip already-complete chunks
  (encode_job resume semantics) — so a crash anywhere replays to the same
  encoded table with no duplicates and no loss.

Decode is oblivious to how rows arrived: every chunk payload is
self-contained under its chunk_id.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import encode_job
from .plan import EncodeConfig
from .schema import SEQUENCES_SPARK_SCHEMA


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: EncodeConfig | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming encode; returns the StreamingQuery.

    available_now=True drains everything currently in input_dir and stops —
    the batch-backfill mode (and what tests use). With available_now=False the
    query keeps watching for new files (optionally rate-limited by
    max_files_per_trigger so one giant drop doesn't become one giant batch).
    """
    reader = spark.readStream.schema(SEQUENCES_SPARK_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def sink(batch_df, batch_id: int) -> None:
        encode_job.run(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            cfg=cfg,
            resume=True,
            salt=f"b{batch_id}",
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint or f"{out_dir}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
