"""SparkSession factory tuned for the encode pipeline.

Local-mode defaults match the sandbox (local[32], one JVM); the same
configs are what we'd pass to spark-submit on a real cluster — partition
sizing and Arrow batch size are the knobs that matter at 100 TB
(SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(master: str | None = None, app: str = "cpp_parquet_spark",
              shuffle_partitions: int | None = None,
              task_cpus: int | None = None) -> SparkSession:
    """``task_cpus``: cores reserved per task. For the hybrid
    JVM+Python encode stages, 2 keeps each (serde thread, Python worker)
    pair inside its slot instead of running 2x the cores in runnable
    threads — measured 2.5x faster at local[32] on the 2 GB encode. Pure
    JVM queries prefer 1. Default: SPARK_GRAFT_TASK_CPUS env or 1."""
    master = master or f"local[{DEFAULT_CPUS}]"
    ncores = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        ncores = int(master[6:-1])
    if task_cpus is None:
        task_cpus = int(os.environ.get("SPARK_GRAFT_TASK_CPUS", "1"))
    sp = shuffle_partitions or max(2 * ncores, 8)
    builder = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.task.cpus", str(max(task_cpus, 1)))
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # one Arrow batch ~ a few pages; too small starves the vectorized
        # kernels, too big risks worker memory at wide content rows
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
