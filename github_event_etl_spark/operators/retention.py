"""Retention operators — the reference's TTL/trim semantics (A10, A17).

- Stream cap: XADD MAXLEN '~' 1000 (insert-events-into-db.lua:33) ==
  "keep the most recent ~N entries". Engine form: a last-N view over the
  append table.
- Aggregate TTL: EXPIREAT next-midnight (update-contributor-scores.js:
  218-220) == partition-drop retention: delete partitions older than the
  horizon. With (date, hour)-partitioned storage that is a metadata-only
  operation, same spirit as Redis key expiry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_n_view(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """Most recent n rows by a monotonic sequence column (the engine's
    replacement for Redis auto stream IDs).

    Implemented as orderBy desc + limit => TakeOrderedAndProject, so the
    "trim" reads k rows per partition, never the full table. The
    reference's '~' (approximate) trim is allowed to overshoot; we are
    exact, which is strictly stronger.
    """
    return df.orderBy(F.col(order_col).desc()).limit(n)


def retain_partitions(df: DataFrame, part_col: Column, min_keep) -> DataFrame:
    """Partition-drop retention as a view: rows whose partition key >=
    horizon. On partitioned parquet this predicate is partition pruning —
    old data is never scanned (EXPIREAT analog)."""
    return df.filter(part_col >= min_keep)
