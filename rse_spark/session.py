"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the configs are chosen so the same
code runs unchanged on a multi-executor cluster (AQE, adaptive skew
join, Arrow batching). ``SPARK_GRAFT_CPUS`` controls local parallelism
(the driver bench uses it as the N / 4N scaling knob).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "rse_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession.

    Parameters mirror cluster knobs: ``cores`` is the local[...] thread
    count (defaults to $SPARK_GRAFT_CPUS, else all cores) and
    ``shuffle_partitions`` defaults to ~2x cores — far closer to optimal
    for local mode than Spark's default 200.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_cores = os.cpu_count() or 8 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * n_cores)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE broadcast the doc-id map-back join (keys+ids only,
        # never content) by its MEASURED runtime size instead of a
        # driver-side row-count heuristic — build.assign_doc_ids is
        # fully declarative on the strength of this (one fewer job in
        # stage A); beyond the threshold AQE falls back to a shuffled
        # hash join of keys+ids, still never content
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # zstd over snappy: this host (and a bandwidth-bound cluster) is
        # limited by bytes moved, not cycles — smaller files cut scan +
        # write + page-cache traffic for a modest parallel CPU cost
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("RSE_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
