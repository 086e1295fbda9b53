"""Stream-stream joins (Structured Streaming's watermarked interval
join) — the B9 feature that correlates two live streams with bounded
state.

Reference analog: the reference correlates an event with its own
earlier occurrences via the Redis dedup log's GET-then-SET within a
TTL (insert-events-into-db.lua:8-11,36-39); generalized, that is a
stream-stream equi-join with a time-bound. Spark's native form: both
sides carry watermarks, the join condition pairs an equi-key with an
event-time interval, and the engine buffers each side's rows in state
ONLY until the other side's watermark passes the interval bound —
state is provably bounded, the core result of the Structured
Streaming model (SIGMOD'18, PAPERS.md).

Scale posture: state per side ≈ input-rate × (interval + watermark
delay), independent of stream lifetime; the join keys partition the
state stores, so hot keys shard with `spark.sql.shuffle.partitions`.
Both inputs shuffle once on the join key — the same exchange a batch
equi-join would plan, plus the state stores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    extra_cond: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream inner join: rows pair when their
    `key` columns are equal AND right's event time falls inside
    [left_ts + lower, left_ts + upper]. Both sides MUST be streaming
    DataFrames; the interval plus the watermarks is what lets the
    engine evict join state (an unconstrained stream-stream equi-join
    would buffer both streams forever).

    Column hygiene: the right side's columns are suffixed `_r` (key
    included — the join condition references both) so the output
    schema is unambiguous. The bounded-replay batch equivalent — what
    the pytest and any DuckDB oracle compare against — is the plain
    interval join over the full inputs: AvailableNow replay drives
    every watermark past every row, so no pairing is lost to
    late-arrival eviction.

    `how='leftOuter'` adds null-extended rows for left rows that never
    matched — BUT only once the engine can PROVE no match can still
    arrive: the left row's whole interval must fall below the final
    GLOBAL watermark, which under Spark's default
    `multipleWatermarkPolicy=min` is the minimum over BOTH inputs'
    watermarks — min(max left event time, max right event time) −
    delay in a bounded replay, NOT the right side's alone (a lagging
    left stream holds the global watermark back even for the right
    side's eviction decisions). Left rows within (delay + upper) of
    that global mark leave the replay with their outer verdict still
    pending — the sink holds the batch outer join MINUS the unmatched
    rows in that tail window. This is not an approximation to paper
    over; it is the semantics of outer joins over unbounded streams
    (an unmatched row near the head of an unbounded stream emits as
    soon as the global watermark passes it), and the pytest pins the
    exact boundary.
    """
    clash = {f"{c}_r" for c in right.columns} & set(left.columns)
    if clash:
        raise ValueError(
            "interval_join_streams: left columns collide with the "
            f"right side's _r-suffixed names: {sorted(clash)} — rename "
            "them on the left input before joining"
        )
    lf = left.withWatermark(left_ts, watermark)
    rf = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    ).withWatermark(f"{right_ts}_r", watermark)
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (
            F.col(f"{right_ts}_r")
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"{right_ts}_r")
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lf.join(rf, cond, how)
