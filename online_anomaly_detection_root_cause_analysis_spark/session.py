"""SparkSession construction tuned for this engine.

Local-mode defaults mirror what a cluster submit would set per-job via
``spark-submit --py-files engine.zip job.py --conf ...`` — AQE on,
shuffle partitions sized to cores (not the 200 default), Arrow
enabled for the pandas-UDF stages, UTC session timezone so event-time
windows compare exactly against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "online-ad-rca-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    # 16g, NOT bigger: an oversized heap anti-scales with threads on
    # this box — allocation-heavy codegen at local[32] ran 36 s with a
    # 64 g heap vs 9-16 s with 16 g (sweeping a huge young gen thrashes
    # the shared memory bus; measured on the 600k-doc minhash stage).
    # On a real cluster each executor sizes its own heap to its share.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        # default G1 collapses under allocation-heavy whole-stage
        # codegen at >12 threads on this VM (measured 4.7x); the
        # throughput collector restores linear scaling
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64-hash minhash/simhash aggregates exceed the default codegen
        # field cap (100) and silently fall back to interpreted eval
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
