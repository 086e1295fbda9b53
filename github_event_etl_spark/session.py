"""SparkSession construction and session-level defaults.

Scale posture (100 TB design, tested on local[32]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and broadcast-join demotion/promotion replace hand-tuned plans.
- Arrow on: every Python<->JVM hop (pandas UDFs, toPandas) is batched.
- UTC session timezone: all reference time semantics are UTC
  (reference: update-contributor-scores.js:12-25 does all date math in
  UTC); making it a session default keeps date_trunc/date_format
  deterministic regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "github-event-etl-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``local[$SPARK_GRAFT_CPUS]`` in this container; on a real cluster the
    master/resource settings come from spark-submit and everything here
    still applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply the config this engine's queries rely on to an externally
    provided session (the verification driver constructs its own).

    Only runtime-settable confs here. UTC is load-bearing: hour/day
    bucketing and timestamp formatting in declared queries must match the
    UTC-based oracle SQL.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # A vanilla session defaults to 200 shuffle partitions — wasteful on
    # local[32] (and each streaming micro-batch materializes one state
    # store per partition). Runtime-settable, so pin it here; AQE still
    # coalesces below this at execution. Safe for the bounded streams:
    # every declared streaming query uses a fresh checkpoint.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(DEFAULT_SHUFFLE_PARTITIONS)
        ),
    )
    # The driver-generated events.parquet stores TIMESTAMP(NANOS), which
    # Spark 4 rejects by default; read as long and let the loader convert
    # (sources.tables.load_table) — data is µs-precision, so exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
