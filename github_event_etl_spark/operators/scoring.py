"""Contributor scoring — the reference's core computation, Spark-first.

Reference dataflow (update-contributor-scores.js):
  NDJSON events -> filter type in (PushEvent, PullRequestEvent) (:124)
  -> project actor.login (:126) -> drop bots (:129)
  -> ZINCRBY per (hour, login): COUNT(*) GROUP BY hour, actor (:131,:28-30)
  -> daily ZUNIONSTORE: element-wise sum over hourly sets (:252-263)
  -> read top-10 by score (README.md:148-150)

Spark realization: one declarative pipeline. Catalyst plans a partial
(map-side) + final hash aggregate for the groupBy — the distributed
equivalent of Redis's per-record increments, with combine before
shuffle so the network carries (bucket, user) partials, not events.
The top-k read becomes TakeOrderedAndProject (per-partition heap +
driver merge of k rows) — no global sort at any scale.

Scale notes (100 TB):
- Group keys are (hour_bucket, user_id): cardinality ~ actors x hours,
  orders of magnitude smaller than the event count -> map-side combine
  absorbs the fan-in; AQE coalesces the post-shuffle partitions.
- Hot actors (skew) are absorbed by partial aggregation (each map task
  pre-counts its slice of the hot key) — no salting needed for COUNT.
- The daily rollup re-aggregates the *hourly aggregate* (tiny), never
  the raw events — same trick the reference plays with ZUNIONSTORE over
  hourly sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import is_scoring_event
from ..functions.timeutil import day_bucket, hour_bucket

DEFAULT_KINDS = ("purchase", "signup")  # stand-in for PushEvent/PullRequestEvent


def hourly_scores(
    events: DataFrame,
    kinds: tuple[str, ...] = DEFAULT_KINDS,
    is_bot: Column | None = None,
    ts_col: str = "ts",
    actor_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """COUNT(*) per (UTC hour, actor) over qualifying non-bot events.

    Returns columns: bucket_hour (string 'yyyy-MM-dd HH'), <actor_col>,
    score (long). One event = one point, regardless of payload size —
    the reference's ZINCRBY-by-1 semantics
    (update-contributor-scores.js:131).
    """
    df = events.filter(is_scoring_event(F.col(type_col), kinds))
    if is_bot is not None:
        df = df.filter(~is_bot)
    return (
        df.groupBy(
            hour_bucket(F.col(ts_col)).alias("bucket_hour"),
            F.col(actor_col),
        )
        .agg(F.count(F.lit(1)).alias("score"))
    )


def daily_rollup(hourly: DataFrame, actor_col: str = "user_id") -> DataFrame:
    """Daily per-actor totals from the hourly aggregate — the engine's
    ZUNIONSTORE (update-contributor-scores.js:252-263): element-wise
    score sum across the day's hourly sets.

    Input is the (tiny) hourly aggregate, so this re-shuffle moves
    pre-combined partials only.
    """
    return (
        hourly.groupBy(
            F.substring("bucket_hour", 1, 10).alias("bucket_day"),
            F.col(actor_col),
        )
        .agg(F.sum("score").alias("score"))
    )


def top_contributors(
    scores: DataFrame, k: int = 10, actor_col: str = "user_id"
) -> DataFrame:
    """Top-k by score — ZREVRANGE 0 k-1 WITHSCORES (README.md:148-150).

    orderBy+limit => TakeOrderedAndProject: each partition keeps a
    k-row heap, the driver merges k*numPartitions rows — never a full
    sort. Deterministic tie-break on actor id.
    """
    return scores.orderBy(F.col("score").desc(), F.col(actor_col).asc()).limit(k)
