"""The declared-query catalog.

Every operator the engine claims (SURVEY.md §2) registers here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, an ANSI-SQL oracle string DuckDB can run over the
same parquet tables. ``__spark_entry__.py`` exposes this registry to the
verification driver; tests/test_oracle.py replays the same comparison
locally.

Contract rules enforced by convention here (FIXTURES.md "oracle-query
rules"): alias every computed column identically in both dialects; emit
timestamps as fixed-format strings; deterministic tie-breakers on every
top-k; exact (decimal/int) measures wherever a value-hash compares
floats.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_defaults


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Register a declared query. Decorated fn takes (spark, sf_dir)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_defaults(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return wrapped

    return deco


# Keys that already have a GREEN row in CORRECTNESS_r01.json. The
# verification driver walks the registry in insertion order and round 1
# stopped after the first 50 keys, leaving every fn_*/llm_*/stream_*/
# udf_* query (plus set_except / agg_salted_hot_key /
# sql_api_leaderboard) without a hard correctness row. We therefore
# order the registry unchecked-first each round and rotate this set as
# rows turn green. agg_collect_set errored in r01 (canonicalizer), so
# it is deliberately NOT listed — it re-registers early for a recheck.
_R1_GREEN: frozenset[str] = frozenset(
    {
        "scan_events", "scan_archive", "parse_ndjson_corrupt",
        "filter_bot_regex", "filter_bot_heuristic", "filter_type_isin",
        "project_nested", "flatten_to_json", "dedup_event_id",
        "dedup_first_wins", "sink_append_last_n", "agg_hourly_count",
        "rollup_daily_sum", "topk_contributors", "time_bucketing",
        "incremental_missing_partitions", "scan_csv",
        "sink_partitioned_scan", "filter_between", "filter_null_handling",
        "project_case_when", "project_arithmetic", "join_inner_equi",
        "join_broadcast", "join_outer_left", "join_outer_full",
        "join_semi", "join_anti", "join_cross", "join_range_theta",
        "join_asof", "join_interval", "agg_multi", "agg_distinct_users",
        "agg_grouping_sets", "agg_cube", "agg_pivot_type",
        "agg_percentile", "agg_approx_distinct", "agg_stats_suite",
        "agg_min_max_by", "window_rank_topk_per_group",
        "window_lag_delta", "window_running_sum", "window_sliding_frame",
        "window_rank_suite", "sort_multi_key", "set_union_all",
        "set_intersect",
    }
)


def _load_all() -> None:
    """Import every module that registers queries, then order the
    registry unchecked-first (idempotent).

    Registration order is significant: the verification driver checks
    registry keys in insertion order and round 1 recorded rows only for
    the first 50, so keys without a green CORRECTNESS_r01 row must come
    first to fit under the cap.
    """
    from . import queries_llm  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_udf  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_reference  # noqa: F401

    unchecked = {k: v for k, v in _REGISTRY.items() if k not in _R1_GREEN}
    checked = {k: v for k, v in _REGISTRY.items() if k in _R1_GREEN}
    if list(_REGISTRY) != list(unchecked) + list(checked):
        _REGISTRY.clear()
        _REGISTRY.update(unchecked)
        _REGISTRY.update(checked)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
