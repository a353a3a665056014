"""SparkSession factory with the engine's tuned defaults.

Every knob here is a 100 TB-scale decision exercised locally:
AQE (+skew join) re-plans the host-skewed shuffles at runtime, Arrow
makes every pandas UDF a columnar batch transfer, shuffle partition count
follows core count locally (on a cluster: ~2-3× total cores, or let AQE
coalesce), and broadcast threshold covers the small dimension tables
(robots, bloom segments, models).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    b = SparkSession.builder.appName(app)
    # Under spark-submit the driver JVM already exists and carries the
    # operator's --master (yarn, k8s, local-cluster, ...); PythonRunner
    # hands this process PYSPARK_GATEWAY_PORT to connect to it. Calling
    # .master() here would silently stomp that choice and fall the whole
    # job back to local mode — so only set a master when the caller asked
    # for one explicitly, or when no submitted JVM exists (plain-python
    # entry, where SparkSession needs SOME master to launch).
    if master is not None:
        b = b.master(master)
    elif "PYSPARK_GATEWAY_PORT" not in os.environ:
        b = b.master(f"local[{cpus}]")
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
