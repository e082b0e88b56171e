"""SparkSession factory tuned for this engine.

Local tests run on ``local[N]``; the configs below are the ones that matter at
cluster scale too (AQE, shuffle sizing, Arrow for the pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kafka-journal-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        # Arrow for pandas UDF / toPandas paths (similarity & multimodal ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # let an id-bucketed table co-partition joins whose keys are a
        # superset of the bucket key (journal ⋈ metajournal on (topic, id)
        # over id-buckets) — the zero-Exchange co-located read path
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
