"""Input-source dispatch for sequence tables (the S1 location-parser tier,
reference src/parquet-linter/src/source.rs — there, file / URL / S3; here,
the storage layer is whatever Spark's DataSource V2 connectors reach).

The north-star input is "an Iceberg table of pre-tokenized training
sequences". On a production cluster that is `spark.read.format("iceberg")`
against a configured catalog — predicate pushdown, partition pruning,
snapshot isolation and time travel all come through the Iceberg DSv2
connector, and every downstream engine op (chunk planning, encode, lint)
consumes a plain DataFrame, so nothing else changes. This sandbox ships no
Iceberg runtime jar, so the iceberg branch is environment-gated: it
attempts the real connector and converts the JVM's class-not-found into an
actionable error naming the missing pieces, and the tests pin BOTH the
parquet path's equivalence and the gated error's message. No fake Iceberg
parser — a hand-rolled metadata/Avro-manifest reader would silently miss
deletes/schema evolution and corrupt the resume contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "iceberg")

_ICEBERG_HINT = (
    "the Iceberg Spark runtime is not on this cluster's classpath; add "
    "org.apache.iceberg:iceberg-spark-runtime and a catalog config "
    "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog) to "
    "spark-submit, or pass format='parquet' with a parquet directory"
)


def read_sequences(
    spark: SparkSession,
    location: str,
    format: str = "parquet",  # noqa: A002 - mirrors spark.read.format
    snapshot_id: int | None = None,
    as_of_timestamp: str | None = None,
) -> DataFrame:
    """Load a sequences table (doc_id, tokens, n_tok, source, extras…).

    - ``parquet``: a directory of parquet files (the sandbox/test path).
    - ``iceberg``: ``location`` is a catalog table identifier
      (``catalog.db.table``); ``snapshot_id`` / ``as_of_timestamp`` select
      an Iceberg snapshot (resume jobs pin one so retries see a stable
      table). Requires the Iceberg runtime on the classpath.
    """
    if format not in _FORMATS:
        raise ValueError(f"unknown source format {format!r}; one of {_FORMATS}")
    if format == "parquet":
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError("snapshot selection is an iceberg-format feature")
        return spark.read.parquet(location)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp is not None:
        reader = reader.option("as-of-timestamp", as_of_timestamp)
    try:
        return reader.load(location)
    except Exception as e:  # surface the gated-environment case readably
        msg = str(e)
        if any(
            s in msg
            for s in (
                "ClassNotFoundException",
                "Failed to find data source: iceberg",
                "Failed to find the data source: iceberg",
                "DATA_SOURCE_NOT_FOUND",
            )
        ):
            raise RuntimeError(f"iceberg source unavailable: {_ICEBERG_HINT}") from e
        raise


def fetch_if_missing(url: str, destination: str, chunk_bytes: int = 1 << 20) -> bool:
    """S7 downloader analog (reference download_if_missing,
    src/parquet-linter-leaderboard/src/download.rs:8-38): stream a remote
    object to a local path, skipping silently when the destination already
    exists — the idempotence that lets a multi-file fetch loop resume after
    a kill, same as the encode job's lineage resume.

    Schemes: ``file://`` (testable in this sandbox) and ``http(s)://`` via
    the same stdlib streaming call (environment-gated here: the sandbox
    allows no external data, so the http branch is exercised only by its
    scheme validation). Two deliberate hardenings over the reference: the
    body streams into ``<dest>.part`` and lands via atomic rename, so a
    killed fetch can never leave a truncated file that the skip-if-exists
    check would later treat as complete; and unknown schemes fail loudly
    instead of being handed to a loader that may guess.

    Returns True if fetched, False if skipped.
    """
    import urllib.parse
    import urllib.request

    scheme = urllib.parse.urlparse(url).scheme
    if scheme not in ("file", "http", "https"):
        raise ValueError(f"unsupported URL scheme {scheme!r} for {url!r} "
                         "(file://, http://, https://)")
    if os.path.exists(destination):
        return False
    parent = os.path.dirname(destination)
    if parent:
        os.makedirs(parent, exist_ok=True)
    import threading

    # unique temp name per (process, thread): two concurrent fetchers of
    # the same object must not interleave writes into one shared .part
    # file — each streams its own and the last atomic rename wins with
    # complete content
    part = f"{destination}.part.{os.getpid()}.{threading.get_ident()}"
    try:
        # timeout: a stalled remote must surface as the OSError the manifest
        # loop handles resumably, not hang the copy loop on a dead socket
        with urllib.request.urlopen(url, timeout=60) as src, open(part, "wb") as dst:
            # copyfileobj would be the obvious loop, but it stops silently
            # when read() returns b"" — and http.client deliberately does
            # NOT raise on a length-known body cut short by a connection
            # drop, so a truncated file would rename into place and the
            # skip-if-exists check would treat it as complete forever.
            # Count bytes and verify against Content-Length when declared.
            length = getattr(src, "headers", None)
            expected = length.get("Content-Length") if length is not None else None
            written = 0
            while True:
                buf = src.read(chunk_bytes)
                if not buf:
                    break
                dst.write(buf)
                written += len(buf)
            if expected is not None and written != int(expected):
                raise OSError(
                    f"truncated fetch of {url!r}: got {written} of "
                    f"{expected} bytes (connection dropped mid-body)"
                )
            dst.flush()
            os.fsync(dst.fileno())
        os.replace(part, destination)
    except BaseException:
        # a failed stream must not leak its partial file next to the data
        try:
            os.unlink(part)
        except OSError:
            pass
        raise
    return True
