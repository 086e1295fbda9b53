"""NDJSON sources — the Spark-native form of the reference's two scans.

Reference parity:
- GH Archive hourly ``.json.gz`` dumps are streamed, gunzipped and parsed
  line-by-line (update-contributor-scores.js:71-96, :103-120). Spark reads
  gzip text natively — no explicit decompress step, distributed one task
  per file.
- Malformed lines are logged and skipped (update-contributor-scores.js:
  147-150). Engine form: line scan + ``from_json`` with an embedded
  corrupt-record field, so bad rows are *flagged* (and filterable)
  instead of killing the job.

Implementation note: this deliberately does NOT use the DataFrameReader
corrupt-column option — Spark disallows plans that reference only the
corrupt column of a JSON scan (e.g. a count() after filtering on it,
once column pruning removes the data columns). ``from_json`` is a plain
column expression with no such restriction, same parser underneath.

Scale note: gzip is not splittable — one .gz file = one input partition.
The reference's unit of work is an hourly archive file, so parallelism
comes from many files, which is exactly how Spark parallelizes this
source too. For 100 TB re-ingest, convert once to parquet with this
reader and run analytics off the columnar copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_ndjson_with_corrupt(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """NDJSON scan keeping a corrupt-record column for error accounting.

    Returns ``schema``'s columns plus CORRUPT_COL (null for good lines,
    the raw line for malformed ones — the reference logs exactly that,
    update-contributor-scores.js:147-150).
    """
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return spark.read.text(path).select(parsed.alias("r")).select("r.*")


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Strict-ish NDJSON scan: explicit schema, PERMISSIVE parse, corrupt
    lines dropped (the reference's skip-and-continue policy)."""
    return (
        read_ndjson_with_corrupt(spark, path, schema)
        .filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL)
    )
