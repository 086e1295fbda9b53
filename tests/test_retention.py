"""Retention operators (SURVEY §2 A10/A17): the partition-drop TTL and
the capped last-N view. The declared query `retention_expire_partitions`
is oracle-checked end-to-end; these tests cover the operator edges the
oracle can't see — which directories are actually deleted, boundary
inclusivity, and non-partition files being left alone."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from github_event_etl_spark.operators.layout import write_day_partitioned
from github_event_etl_spark.operators.retention import (
    expire_day_partitions,
    last_n_view,
)


def test_expire_day_partitions_drops_only_expired(spark, tmp_path):
    out = str(tmp_path / "by_day")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-05 10:00:00"),
            (3, "2024-01-10 10:00:00"),
            (4, "2024-01-10 23:59:59"),
        ],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    write_day_partitioned(df, out)

    dropped = expire_day_partitions(out, "2024-01-10")
    # strictly-older days dropped; the horizon day itself is KEPT
    assert dropped == ["2024-01-01", "2024-01-05"]
    kept_dirs = sorted(
        e for e in os.listdir(out) if e.startswith("bucket_day=")
    )
    assert kept_dirs == ["bucket_day=2024-01-10"]
    # non-partition entries (_SUCCESS) survive the sweep
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # surviving data reads back intact through the partitioned path
    kept = spark.read.parquet(out)
    assert sorted(r.event_id for r in kept.collect()) == [3, 4]
    # idempotent: nothing more to drop on a second pass
    assert expire_day_partitions(out, "2024-01-10") == []


def test_last_n_view_is_exact_top_n(spark):
    df = spark.range(1000).select(F.col("id").alias("event_id"))
    got = sorted(r.event_id for r in last_n_view(df, "event_id", 10).collect())
    assert got == list(range(990, 1000))


def test_expire_rejects_malformed_horizon_and_skips_stray_files(tmp_path):
    """Safety rails: a non-zero-padded horizon would lexicographically
    drop the wrong partitions — reject it before any deletion; a stray
    regular FILE with the partition prefix must be skipped, not crash
    the sweep mid-drop."""
    import pytest as _pytest

    from github_event_etl_spark.operators.retention import (
        expire_day_partitions,
    )

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "bucket_day=2024-01-01"))
    os.makedirs(os.path.join(root, "bucket_day=2024-02-01"))
    # stray FILE carrying the partition prefix
    with open(os.path.join(root, "bucket_day=2024-01-15"), "w") as f:
        f.write("not a directory")

    for bad in ("2024-1-5", "24-01-05", "20240105", "yesterday", ""):
        with _pytest.raises(ValueError):
            expire_day_partitions(root, bad)
    # nothing was deleted by the rejected calls
    assert len(os.listdir(root)) == 3

    dropped = expire_day_partitions(root, "2024-01-20")
    assert dropped == ["2024-01-01"]
    # the stray file survives untouched; later partition kept
    assert os.path.isfile(os.path.join(root, "bucket_day=2024-01-15"))
    assert os.path.isdir(os.path.join(root, "bucket_day=2024-02-01"))
