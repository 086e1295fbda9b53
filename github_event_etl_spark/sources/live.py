"""Live-connector ingest sources (SURVEY.md §2 A1; §1.4 D1).

The reference's ingest is a polling loop — GET https://api.github.com/
events every few seconds, push each JSON event into the store
(insert-events.js:8-34, 62). The Spark-native shape is a streaming
SOURCE feeding the same typed event pipeline:

- `read_socket_events`: a TCP text socket delivering one JSON event
  per line. This is the sandbox-runnable live path — a real network
  connector the micro-batch engine polls continuously, exercised
  end-to-end by tests/test_live_ingest.py against an in-process
  NDJSON server. (Spark's socket source is documented as a dev/test
  source — at production scale the same parse stage rides on Kafka.)
- `read_kafka_events`: the production connector (SURVEY §1.4 names
  Kafka as the A1 alternative). The container has no broker and no
  spark-sql-kafka artifact, so THIS function cannot run here — but
  the value-parsing stage is shared, batch-testable code
  (`parse_event_lines`), and the wrapper is the complete production
  wiring: subscribe → cast value to string → parse → typed events.

Both sources funnel through ONE parse function so the tested path and
the cluster path cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The stable envelope of one ingested event (SURVEY §1.2): the fields
# the reference actually computes on, typed; everything else stays in
# the JSON string (schema-on-read, like the payload flatten A8).
EVENT_ENVELOPE = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def parse_event_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """JSON-line column → typed event rows. Shared by every live
    connector (socket, Kafka) AND directly batch-testable: the parse
    is a pure column expression, so one from_json per line, malformed
    lines null out (error isolation, A3/A19 semantics) and are
    dropped.

    Map-side only — a parse stage never shuffles, so ingest
    parallelism equals source partition count at any scale."""
    parsed = F.from_json(F.col(line_col).cast("string"), EVENT_ENVELOPE)
    return (
        lines.select(parsed.alias("e"))
        .filter(F.col("e").isNotNull() & F.col("e.event_id").isNotNull())
        .select(
            F.col("e.event_id").alias("event_id"),
            F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
        )
    )


def read_socket_events(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """Live ingest over a TCP line socket — the engine polls the
    connection exactly like the reference's loop polls the HTTP API
    (insert-events.js:8-34), with the micro-batch engine supplying the
    batching, backpressure, and restart the reference hand-rolls."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_event_lines(raw, "value")


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production live ingest: one Kafka topic of JSON events → typed
    stream. Requires the spark-sql-kafka connector on the classpath
    and a reachable broker — neither exists in this container (Maven
    Central is unreachable, so `spark.jars.packages` cannot fetch the
    artifact, and no local/ivy jar is present). The wrapper is instead
    pinned by a batch contract test
    (tests/test_live_ingest.py::test_kafka_wrapper_contract_without_broker)
    that captures the exact format/option wiring and pushes rows with
    the real Kafka source schema (binary value) through it; the parse
    stage is shared with the fully-executed socket path. Partition
    count of the topic is the ingest parallelism; offsets + checkpoint
    give exactly-once into the event table (A13 idempotence analog)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_lines(raw, "value")
