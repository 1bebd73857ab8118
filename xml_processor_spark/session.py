"""SparkSession factory tuned for both local verification and cluster scale.

Local runs use ``local[N]``; at cluster scale the same builder applies — only
``master`` and memory sizing change. The scale-relevant settings (AQE with
skew-join handling, sensible shuffle partitioning, Arrow for the Python data
plane) are on by default so every operator is exercised under the execution
model it would see on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "xml_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    # Match shuffle width to cores: at local scale more partitions is pure
    # scheduling overhead; on a real cluster this is raised alongside
    # executor count and AQE coalesces from runtime shuffle statistics
    # (SURVEY §4), so the setting scales with the deployment, not the code.
    shuffle_partitions = shuffle_partitions or max(cpus // 2, 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow: the only sane executor<->Python data plane (pandas UDFs).
        # Large batches amortize the per-batch Python round-trip.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Deterministic timestamps across engines (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
