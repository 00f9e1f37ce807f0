"""SparkSession factory with the engine's required configuration.

Arrow execution + AQE (skew handling, partition coalescing) are load-bearing:
every encode/decode kernel is an Arrow-native grouped UDF (applyInArrow), and AQE is the
runtime half of the skew strategy (the planning half is n_tok-aware bucket
fan-out in chunking.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "tokenlake",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """`master=""` (empty string) means: do NOT set a master here — inherit
    whatever `spark-submit --master ...` / the cluster manager provided.
    That is the deploy path (jobs/submit_encode.py); `None` keeps the
    local[] default for in-process library use and tests."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    inherit = master == ""
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        if inherit:
            # cluster mode: executors × cores isn't knowable here; AQE
            # coalescing makes 2× core-count a safe static floor, and the
            # deploy wrapper can override per cluster size
            shuffle_partitions = int(os.environ.get("TOKENLAKE_SHUFFLE_PARTITIONS", "64"))
        else:
            n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
            # local[4,2] (maxFailures) and local-cluster[2,1,1024] are valid
            # master forms: take the FIRST bracket field; anything
            # unparsable falls back to the 32-core default instead of
            # crashing before the session even builds
            head = n.split(",")[0].strip()
            # 2× the core count, not 1×: the encode groupBy hashes ~1-2
            # chunk groups per partition at bench scale, and with exactly
            # one partition per core a single unlucky double-loaded task
            # sets the stage wall. 2× halves the balance quantum; AQE
            # coalescing folds the surplus away when partitions run small.
            shuffle_partitions = 64 if not head.isdigit() else max(8, 2 * int(head))
    builder = SparkSession.builder
    if not inherit:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TIME columns (experimental in this Spark line, off by default);
        # the generic registry stores them through the int carrier paths
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # rows carry ~1.6 KB token arrays: 8192-row Arrow batches ≈ 13 MB keep
        # per-task JVM buffering bounded with many concurrent grouped-UDF tasks
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # token-array rows expand several × from parquet to in-memory Arrow,
        # and every scan here feeds either a shuffle map stage (encode) or a
        # Python decode kernel — per-task in-memory working sets are what the
        # split size must bound, not raw parquet bytes. 16 MB parquet ≈
        # 50-60 MB decoded. Smaller splits also fan single big files out
        # across cores (a 250 MB input is a 16-way scan instead of 8-way).
        # Parameterised: clusters with thousands of cores and TB inputs
        # should raise this (guide §6) via TOKENLAKE_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("TOKENLAKE_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        # encoded-table files hold ~8 multi-MB chunk rows each and every row
        # costs real Python decode CPU — packing several files into one scan
        # split (the 4 MB default open cost) caps decode parallelism at
        # ~files/4 instead of file count. A high open cost keeps ≈1 encoded
        # file per task; plain-parquet scans lose nothing (their files are
        # split-sized anyway).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("TOKENLAKE_OPEN_COST_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("TOKENLAKE_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    return builder.getOrCreate()
