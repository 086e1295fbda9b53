"""Parquet table loaders with explicit schemas (FIXTURES.md).

Explicit schemas — never inferSchema — so scans are single-pass and the
analyzer can prune nested/unused columns before the scan at any scale.
At 100 TB the footer-sample inference pass alone would be a job.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Schemas transcribed from FIXTURES.md (driver-generated parquet footers).
SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Parquet scan: columnar, predicate-pushdown
    and column-pruning friendly — the analyzer prunes to exactly the
    referenced columns (visible as ReadSchema in .explain).

    events.ts is TIMESTAMP(NANOS) in the parquet footer; Spark 4 reads
    it as nanos-since-epoch long (spark.sql.legacy.parquet.nanosAsLong,
    set in session defaults). Converted here with exact integer division
    (`div`, never float) to a µs TimestampType — the generated data is
    µs-precision so the conversion is lossless.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Defensive NTZ normalization: if this session scanned the footer with
    # NTZ inference on (e.g. an externally built session that skipped
    # ensure_session_defaults), rewrite naive-UTC TIMESTAMP_NTZ columns to
    # TIMESTAMP. Session timezone is pinned UTC, so the cast is the
    # identity on the underlying micros value — no instant shift.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    # Footer-drift guard: the test parquet is regenerated out-of-band and
    # its physical types have drifted before (TIMESTAMP(NANOS) → µs-NTZ).
    # Where the declared schema (SCHEMAS) differs only by a LOSSLESS cast
    # (integer widening, float→double, decimal→double), normalize to the
    # declared type so every downstream plan and oracle sees the stable
    # engine schema. Genuine shape changes (new/renamed columns) are NOT
    # silently papered over — they surface in the first query that
    # references the missing column.
    want = SCHEMAS.get(name)
    if want is not None:
        have = dict(df.dtypes)
        widen_ok = {
            ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
            ("smallint", "int"), ("smallint", "bigint"),
            ("int", "bigint"), ("float", "double"),
        }
        for field in want.fields:
            got = have.get(field.name)
            wanted = field.dataType.simpleString()
            if got is None or got == wanted:
                continue
            decimal_ok = False
            if got.startswith("decimal") and wanted == "double":
                # Only lossless when every value fits a double's 53-bit
                # mantissa: gate on precision ≤ 15 significant digits.
                # A wider decimal is genuine drift — let it surface
                # downstream rather than silently losing precision.
                m = re.match(r"decimal\((\d+),", got)
                decimal_ok = bool(m) and int(m.group(1)) <= 15
            if (got, wanted) in widen_ok or decimal_ok:
                df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register test tables as temp views for spark.sql queries.

    `only` restricts registration to the named tables: every
    registration costs a parquet-footer read on the driver, so a query
    that touches one table shouldn't pay for ten."""
    for name in only if only is not None else TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
