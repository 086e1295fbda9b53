"""Top-k operators (reference A15 and its per-group generalization).

Global top-k: orderBy+limit -> Catalyst's TakeOrderedAndProject
(per-partition k-heap, driver merge). Per-group top-k: row_number over a
hash-partitioned window — the distributed form of "one ZSET per hour,
ZREVRANGE each" (README.md:148-150).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k. Pass deterministic tie-breakers in ``order``."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: list[str], order: list[Column], k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k within each group, rank retained.

    row_number (not rank) + explicit tie-breakers => exactly k rows per
    group, deterministic. One shuffle on the group key; skewed groups
    are bounded by k rows output each.
    """
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
