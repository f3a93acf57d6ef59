"""SparkSession factory.

The reference's config singleton (config.d:24-73) maps to Spark's own
``getOrCreate`` singleton; the knobs here are the scale-relevant ones:
AQE (runtime re-plan + skew-join splitting), Arrow for the pandas-UDF
parse stage, UTC timezone pinned for oracle comparison, and shuffle
partitions sized to the local core count (on a real cluster this is set
per-job via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "anendektos_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores=None`` → ``local[*]``. On a real cluster this function is not
    used — ``spark-submit`` owns the session config and ``main.py`` calls
    ``SparkSession.builder.getOrCreate()`` bare.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    shuffle = shuffle_partitions or (cores if cores else 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
