"""github_event_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``bytrangle/github-event-etl`` (a Node.js + Redis + Lua
GitHub-event ETL pipeline) in idiomatic Spark: DataFrame API, Spark SQL,
Catalyst, and Structured Streaming — extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
and designed for 100 TB scale.

Layout:
    session     SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
    sources     typed readers for parquet / NDJSON(.gz) / CSV
    functions   column-level building blocks (predicates, time, text, ...)
    operators   composite dataflow operators (dedup, as-of join, top-k, ...)
    plans       the query catalog consumed by __spark_entry__.py
    streaming   Structured Streaming pipelines (windowed aggs, dedup)
"""

__version__ = "0.1.0"
