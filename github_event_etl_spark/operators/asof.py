"""As-of and interval joins (SURVEY.md §2 B3, §4.3.2).

Spark's SQL engine has no native ASOF JOIN. The naive encoding —
range join + groupBy/max — degenerates to a broadcast-nested-loop with
an O(left x right-per-key) blowup. This implementation uses the
union + ordered-window formulation instead:

    tag(left=1) ∪ tag(right=0)
    -> window PARTITION BY key ORDER BY (ts, tag, seq)
       last(right_payload, ignorenulls) over rows unbounded preceding
    -> keep left rows

One shuffle on the key, one per-partition sort — O((|L|+|R|) log) per
key group, no pair explosion; this is the scalable formulation at
100 TB (both sides stream through a single sort-based window). Ties at
equal ts: the right row sorts first (tag 0 < 1), so an exactly-
coincident right row IS visible to the left row — standard asof "<="
semantics; seq breaks residual ties deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    seq: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the most recent right row (same key,
    right ts <= left ts). Right payload columns come back as
    ``prefix<name>`` (null when no earlier right row exists)."""
    payload = F.struct(*[F.col(c) for c in right_payload])
    l = left.withColumn("__tag", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    ).withColumn("__ts", F.col(left_ts))
    r = (
        right.withColumn("__tag", F.lit(0))
        .withColumn("__payload", payload)
        .withColumn("__ts", F.col(right_ts))
    )
    l_cols = set(left.columns)
    common = ["__ts", "__tag", "__payload", key]
    merged = l.select(
        *[F.col(c) for c in left.columns if c != key], *common
    ).unionByName(
        r.select(
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
              for c in left.columns if c != key],
            *common,
        )
    )
    order = [F.col("__ts").asc(), F.col("__tag").asc()]
    if seq is not None:
        order.append(F.col(seq).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    for c in right_payload:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__match.{c}"))
    return out.drop("__tag", "__payload", "__match", "__ts")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: Column,
    left_end: Column,
    right_start: Column,
    right_end: Column,
    how: str = "inner",
) -> DataFrame:
    """Half-open interval overlap: [ls, le) ∩ [rs, re) non-empty.

    Plain theta join — Catalyst picks broadcast-nested-loop when one
    side is small (the literal-calendar case). For two large interval
    sets, pre-bucket both sides to a common grid and equi-join on the
    bucket before applying this residual predicate.
    """
    cond = (left_start < right_end) & (right_start < left_end)
    return left.join(right, cond, how)
