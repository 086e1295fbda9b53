"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``github_event_etl_spark`` package; this
module only adapts its query catalog to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core computation end-to-end — the daily
    contributor leaderboard (SURVEY.md §7 Phase 1).

    events -> filter scoring types (update-contributor-scores.js:124)
           -> drop bots via the batch heuristic (:45-68, on a
              deterministic login derived from user_id)
           -> COUNT(*) per (hour, actor)  (:131)
           -> daily rollup (ZUNIONSTORE analog, :252-263)
           -> top-10 by score (README.md:148-150)
    """
    from pyspark.sql import functions as F

    from github_event_etl_spark.functions.predicates import is_bot_login_heuristic
    from github_event_etl_spark.operators.scoring import (
        daily_rollup,
        hourly_scores,
        top_contributors,
    )
    from github_event_etl_spark.plans._synth import synth_login
    from github_event_etl_spark.session import ensure_session_defaults
    from github_event_etl_spark.sources.tables import load_table

    ensure_session_defaults(spark)
    events = load_table(spark, SMOKE_SF_DIR, "events").withColumn(
        "login", synth_login()
    )
    hourly = hourly_scores(
        events, is_bot=is_bot_login_heuristic(F.col("login"))
    )
    daily = daily_rollup(hourly)
    return top_contributors(daily.groupBy("user_id").agg(
        F.sum("score").alias("score")
    ), k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from github_event_etl_spark.plans.catalog import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (rows-only ops omitted)."""
    from github_event_etl_spark.plans.catalog import oracle_map

    return oracle_map()
