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

import functools
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


# Queries whose OUTPUT semantics changed since their last green
# CORRECTNESS row. The artifact-derived staleness ordering below cannot
# see code changes, so any query edited in a way that alters its result
# (schema, values, operands) must be listed here for the round in which
# it changed: it registers ahead of everything else so the driver's
# 50-key/round cap re-hash-verifies it. Entries SELF-CLEAR: an entry
# is honored only until the key earns a green row in an artifact NEWER
# than `_CHANGED_AFTER_ROUND` (the last round whose artifacts predate
# the change). Once the post-change verification lands, the key
# rejoins normal staleness ordering — a forgotten entry cannot
# permanently hog the 50-key budget.
_CHANGED_AFTER_ROUND = 18  # round-19 edits; r01-r18 artifacts predate them

_CHANGED_THIS_ROUND: frozenset[str] = frozenset({
    # round 19: llm_ann_recall_eval gained a third evaluated method —
    # the IVFADC+refine path joins IVF and RHP-LSH in the recall
    # harness (VERDICT r18 item 6) — so its output grew from 2×Q to
    # 3×Q rows and both the Spark body and the oracle changed
    # together; the key must re-hash-verify inside the r19 window.
    # Every other r19 edit is result-identical for registered keys:
    # the indexed-twin consolidation DEMOTES two slots (see below),
    # the IVF-PQ serving-layout maintenance extends slot-less
    # components, and ann_ivf_pq_partitioned's lists read moved to
    # read_index (identical frame when no maintenance generations
    # exist — no catalog key maintains its layout in-key).
    "llm_ann_recall_eval",
})

# Keys added when the current round's 50-key verification window is
# already exactly full (changed + never-checked + every stale key):
# rank them LAST so they don't evict a stale key past the one-round
# staleness discipline. Round-anchored and self-clearing: the deferral
# holds only while the newest CORRECTNESS artifact predates
# `_DEFER_NEW_UNTIL_ROUND`; once that round's artifact lands, these
# become ordinary never-checked keys and jump to the front of the next
# round's window.
#
# New-keys-per-round budget: with R registry keys and the driver's
# 50-key cap, stalest-first ordering re-verifies every key each
# ceil(R / 50) rounds — that ceiling IS the documented worst-case
# staleness bound, pinned against the live registry size by
# tests/test_oracle.py::test_catalog_staleness_ordering via
# `staleness_bound_rounds()` below. Two levers keep the bound small:
# (1) at most ~3 new/changed keys per round (each admitted key
# displaces one least-stale key by one round), and (2) consolidating
# strict-projection keys into their verified superset's slot (e.g.
# llm_token_shards is a public projection of llm_pack_offsets and
# holds no slot of its own).
#
# Indexed-twin consolidation — EXECUTED r19 (VERDICT r18 item 2): the
# registry sat at exactly 150 keys (the bound-3 boundary, zero
# admission slots), and the two indexed/in-memory dedup pairs were
# RESULT-IDENTICAL by construction — each pair shared one oracle
# string verbatim (_INCRM_ORACLE; _INCR_SEM_ORACLE) and is pinned by a
# frame-equality pytest — so the indexed member of each dropped to a
# slot-less public twin (the llm_token_shards precedent), freeing two
# slots with zero loss of verified surface:
#   llm_dedup_incremental_indexed           (slot-less since r19)
#   llm_dedup_incremental_semantic_indexed  (slot-less since r19)
# Both remain public API, frame-equality- and plan-gate-pinned in
# tests/test_llm.py, and keep their bench.py component census seats
# (benched via the module functions, not the catalog). Registry after
# consolidation: 148 keys, staleness bound 3, two admission slots.
_DRIVER_KEYS_PER_ROUND = 50


def staleness_bound_rounds() -> int:
    """Worst-case rounds between driver hash-checks of any one key:
    ceil(registry size / driver window)."""
    n = len(all_specs())
    return -(-n // _DRIVER_KEYS_PER_ROUND)
_DEFER_NEW_UNTIL_ROUND = 19
_DEFERRED_NEW_KEYS: frozenset[str] = frozenset({
    # r19 window arithmetic: registry 149 = 148 after the
    # indexed-twin consolidation (150 − 2 demotions, both demoted
    # keys last green r16) + 1 deferred admission below. Cohorts
    # among the 148 pre-admission keys: 48 × r16 / 50 × r17 /
    # 50 × r18 (recomputed from the artifacts at edit time). The r19
    # window was ALREADY exactly full — 1 changed
    # (llm_ann_recall_eval, rank (0,0)) + all 48 r16-stale keys + 1
    # earliest-registered r17 key = 50, rotating the entire r16
    # cohort so no key's latest green row predates r17 after r19 —
    # so the round's one admission rides the deferral: it ranks LAST
    # until CORRECTNESS_r19 lands (19 < 19 is false), then becomes
    # r20's never-checked front-rider, where the window has exactly
    # one free slot (1 new + 49 r17-stale = 50; one r17 key was
    # re-checked early in r19). Bound stays ceil(149/50) = 3 with
    # one admission slot still open.
    "llm_ivf_pq_apply_diff",
})

# Declared rows-only queries whose correct answer may legitimately be
# empty. A 0-row result from one of these still earns a green staleness
# row (it is not suspicious), so it cannot permanently occupy one of
# the driver's 50 per-round verification slots. Keys NOT listed here
# keep the strict `spark_rows > 0` rule: an unexpected empty result
# stays stale and gets re-checked every round until fixed.
_ROWS_ONLY_EMPTY_OK: frozenset[str] = frozenset()


@functools.lru_cache(maxsize=1)
def _newest_artifact_round() -> int:
    """Highest round number among the CORRECTNESS_r*.json artifacts
    (0 when none exist). Anchors the self-clearing deferral window."""
    import glob
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


@functools.lru_cache(maxsize=1)
def _rounds_checked_green() -> dict[str, int]:
    """Latest round in which each query key earned a green driver row.

    Derived from the CORRECTNESS_r*.json artifacts (not a hand-maintained
    set — a stale manual entry could silently mask a changed query).
    Green = all three of rows/schema/hash matched, or a declared
    rows-only check that produced at least one row without error (a
    0-row rows-only result counts as stale so it gets re-checked).
    Cached for the process lifetime: artifacts only change between
    driver rounds, and every catalog access funnels through here.
    """
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            hash_green = row.get("hash_match") is True
            spark_rows = row.get("spark_rows")
            rows_only_green = (
                row.get("err") == "no_oracle"
                and isinstance(spark_rows, int)
                and (spark_rows > 0 or key in _ROWS_ONLY_EMPTY_OK)
            )
            if hash_green or rows_only_green:
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


def _load_all() -> None:
    """Import every module that registers queries, then order the
    registry stalest-first (idempotent).

    Registration order is significant: the verification driver checks
    registry keys in insertion order and caps each round at 50 keys.
    Ordering is (1) queries changed this round, (2) queries with no
    green row in any CORRECTNESS artifact, (3) everything else by
    ascending last-green round — so the driver always re-verifies the
    keys whose hard signal is most stale.
    """
    from . import queries_llm  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_udf  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_reference  # noqa: F401

    last_green = _rounds_checked_green()

    def rank(item: tuple[str, QuerySpec]) -> tuple[int, int]:
        key = item[0]
        if (
            key in _CHANGED_THIS_ROUND
            and last_green.get(key, 0) <= _CHANGED_AFTER_ROUND
        ):
            return (0, 0)
        if (
            key in _DEFERRED_NEW_KEYS
            and _newest_artifact_round() < _DEFER_NEW_UNTIL_ROUND
        ):
            return (2, 0)
        return (1, last_green.get(key, 0))

    ordered = dict(sorted(_REGISTRY.items(), key=rank))
    if list(_REGISTRY) != list(ordered):
        _REGISTRY.clear()
        _REGISTRY.update(ordered)


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
