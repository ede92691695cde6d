"""SparkSession construction tuned for both local testing and cluster scale.

The reference delegates execution to SQL Server; our engine delegates to
Spark, so the session config IS our executor tuning.  Defaults are chosen for
the 100 TB design point (AQE on, skew-join handling, broadcast threshold) and
scaled down via env vars for local runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _int_env(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def build_session(
    app_name: str = "ssis_to_dbt_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with the engine's scale posture baked in.

    - AQE on (runtime re-plan, skew-join split, partition coalescing)
    - UTC session timezone (deterministic date extraction from instants)
    - Arrow enabled (fast pandas-UDF boundary for the text/multimodal ops)
    - shuffle partitions sized by env (32 locally; thousands on a cluster)
    """
    cpus = _int_env("SPARK_GRAFT_CPUS", 32)
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or _int_env("SPARK_GRAFT_SHUFFLE", cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_correctness(spark: SparkSession) -> SparkSession:
    """Runtime-settable knobs applied to a session we did NOT build.

    The correctness driver passes us its own SparkSession; timezone must be
    pinned to UTC so date extraction from parquet timestamps matches DuckDB's
    naive-timestamp semantics.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
