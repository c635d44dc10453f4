"""SparkSession factory tuned for the engine.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same code runs under spark-submit with whatever master the
deployment provides — nothing here assumes local mode except the
defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app: str = "atire_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession.

    ``cpus`` only applies when no master is configured (local mode);
    ``shuffle_partitions`` defaults to 4× the core count: AQE coalesces
    surplus small partitions for free, while UNDER-partitioning makes
    shuffle partitions outgrow task memory and spill — measured 52%
    faster index build at 700k turns / 8 cores with 64 vs 8 partitions.
    At cluster scale the same rule applies per executor core.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app)
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or 4 * cpus)
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT"):
        builder = builder.master(f"local[{cpus}]")
        # single-JVM local mode: the throughput collector handles the
        # Arrow-batch allocation pattern better than G1 at high task
        # counts (measured; real clusters keep their own GC settings)
        builder = builder.config(
            "spark.driver.extraJavaOptions", "-XX:+UseParallelGC"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
