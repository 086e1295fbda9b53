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


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_reference  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_udf  # noqa: F401


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
