"""SparkSession factory tuned for this engine.

Local mode is the sandbox proxy for a multi-executor cluster; all layout
decisions (doc-sharding, salted repartition, compressed postings) are made
for 1000-executor / 100 TB scale and validated here via partitioning- and
parallelism-invariance tests.

Iceberg is the primary production catalog per BASELINE.json input_hint; the
runtime jars are not in this sandbox, so ``table_io`` falls back to plain
parquet paths with identical schemas (feature-flagged, SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tiny_search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # one BLAS thread per Python worker: parallelism belongs to Spark.
    # Without this, N workers x default-N-thread OpenBLAS pools = N^2
    # threads -> kernel-time thrash (measured 2.6x slower build at
    # local[32] on 32 cores).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # explicit skew handling is ours (doc-sharding); AQE's is belt+braces
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
