"""Physical table layout: partitioned and bucketed writes (SURVEY.md
§1.4, §4.2; reference key scheme redis-key-generator.js:1-10).

The reference partitions by encoding `{date}:{hour}` into Redis key
names (update-contributor-scores.js:28-30); the Spark-native equivalent
is real partition columns — `write.partitionBy('bucket_day', ...)` —
which buy partition PRUNING at read time: a query filtered on the
partition column opens only the matching directories, the 100 TB
equivalent of the reference's EXISTS-then-skip hour loop (A13).

Bucketing is the second layout lever: two tables bucketed by the same
key into the same bucket count join WITHOUT a shuffle exchange — the
rows are already co-located by bucket id. At 100 TB the facts→dims
join shuffle is usually the single largest cost in a pipeline; a
bucketed fact table pays that shuffle once at write time and amortizes
it over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_day_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write `df` as parquet partitioned by the UTC day of `ts_col`.

    The partition value is a fixed-format string (yyyy-MM-dd) so the
    directory names are stable lexicographic day keys — same shape the
    reference encodes into its score keys (A16/A18)."""
    out = df.withColumn(
        "bucket_day", F.date_format(F.col(ts_col), "yyyy-MM-dd")
    )
    out.write.mode(mode).partitionBy("bucket_day").parquet(path)


def read_day_partition(
    spark: SparkSession, path: str, day: str
) -> DataFrame:
    """Read exactly one day partition. The equality filter on the
    partition column is resolved against directory names (PartitionFilters
    in the scan) — no data files outside the day are opened."""
    df = spark.read.parquet(path)
    return df.filter(F.col("bucket_day") == day)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Register `df` as a bucketed (and optionally sort-within-bucket)
    parquet table. Bucketing metadata lives in the catalog, so this is
    a `saveAsTable`, not a path write; the explicit `path` keeps the
    files out of the default warehouse.

    Joins between two tables bucketed on the same key with the same
    bucket count skip the shuffle exchange entirely; with matching
    `sort_col` they skip the sort as well (a zip-merge join per
    bucket)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
