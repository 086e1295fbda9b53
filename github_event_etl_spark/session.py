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
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
    # Driver parquet timestamps carry no timezone (isAdjustedToUTC=false);
    # with NTZ inference on, Spark 4 reads them as TIMESTAMP_NTZ, which
    # strict functions (unix_micros, window) reject. The data is naive UTC
    # and the session timezone is UTC, so reading as TIMESTAMP is the
    # identical instant; load_table also normalizes defensively.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    _ship_package(spark)
    return spark


_SHIPPED_SESSIONS: set[int] = set()
_PKG_ZIP: str | None = None


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    consumer session's working directory.

    cloudpickle serializes module-level functions (pandas UDFs,
    applyInPandas/mapInPandas callables) BY REFERENCE, so every Python
    worker must be able to `import github_event_etl_spark`. A consumer
    that starts its session outside the repo root would otherwise fail
    with ModuleNotFoundError on the first UDF task. Shipping the
    package as a zip via addPyFile is the standard Spark mechanism and
    works identically on a 1000-executor cluster (the zip rides the
    file server; ~40 kB once per session)."""
    sid = id(spark)
    if sid in _SHIPPED_SESSIONS:
        return
    global _PKG_ZIP
    import tempfile
    import zipfile

    # Build into a per-process private directory (mkdtemp => mode 0700,
    # unpredictable name), cached for the process lifetime. A fixed
    # world-writable path would let another user on a shared host
    # pre-create the file and have THEIR code shipped to every Python
    # worker; a private fresh build removes both the tampering and the
    # stale-zip (future-mtime) windows.
    if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        py_files = []
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    py_files.append(os.path.join(root, fn))
        zdir = tempfile.mkdtemp(prefix="geetl_spark_pkg_")
        zpath = os.path.join(zdir, "geetl_spark_pkg.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for p in sorted(py_files):
                arc = os.path.join(
                    "github_event_etl_spark", os.path.relpath(p, pkg_dir)
                )
                zf.write(p, arc)
        _PKG_ZIP = zpath
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        # Non-fatal: sessions launched from the repo root (tests, bench,
        # the verification driver) resolve the package from cwd anyway.
        pass
    _SHIPPED_SESSIONS.add(sid)
