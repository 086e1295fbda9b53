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
_CHANGED_AFTER_ROUND = 17  # round-18 edits; r01-r17 artifacts predate them

_CHANGED_THIS_ROUND: frozenset[str] = frozenset({
    # round 18: no output-semantics changes. The r18 diff is additive
    # (the new llm_ann_ivf_pq_refine key, a never-checked front-rider)
    # plus result-identical refactors: llm_ann_ivf_pq's oracle CTE
    # chain hoisted into the shared _ivf_pq_rank_ctes builder with a
    # byte-identical oracle string (md5-checked at edit time), and the
    # index-maintenance PHYSICAL layer's commit protocol ported to a
    # manifest — no catalog key touches that layer (both *_apply_diff
    # keys run the logical apply_index_diff, unchanged).
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
# Pre-identified consolidation candidates if admissions ever push the
# registry past 150 (where the bound flips to 4): the two
# indexed/in-memory dedup twins are RESULT-IDENTICAL by construction —
# each pair shares one oracle string verbatim (_INCRM_ORACLE;
# _INCR_SEM_ORACLE) and is pinned by a frame-equality pytest — so
# either member of each pair could drop to a slot-less public twin
# (the llm_token_shards precedent), freeing two slots with zero loss
# of verified surface:
#   llm_dedup_incremental_minhash  ↔ llm_dedup_incremental_indexed
#   llm_dedup_incremental_semantic ↔ llm_dedup_incremental_semantic_indexed
_DRIVER_KEYS_PER_ROUND = 50


def staleness_bound_rounds() -> int:
    """Worst-case rounds between driver hash-checks of any one key:
    ceil(registry size / driver window)."""
    n = len(all_specs())
    return -(-n // _DRIVER_KEYS_PER_ROUND)
_DEFER_NEW_UNTIL_ROUND = 18
_DEFERRED_NEW_KEYS: frozenset[str] = frozenset({
    # r18 window arithmetic: r17's one deferral (llm_ivf_apply_diff)
    # SELF-CLEARED when CORRECTNESS_r17 landed (17 < 17 is false) and
    # leads r18's window as the never-checked front-rider, joined by
    # the one in-window r18 admission (llm_ann_ivf_pq_refine) —
    # 2 never-checked + 48 r15-stale = 50, verified against
    # _rounds_checked_green() at edit time. The admission rides WITHIN
    # the ~3/round budget: it displaces the single oldest-r16 rotation
    # (re-checked r19 inside the 3-round bound), not a stale r15 key,
    # so after r18 no key's latest green row predates r16 — the
    # round's gate. No key needs deferral this round; the set is empty
    # (kept, with its self-clearing arithmetic, for the next
    # over-budget admission).
    # Registry 150 = the bound boundary: staleness_bound_rounds()
    # holds at 3 with ZERO admission slots left — the NEXT admission
    # must first execute the pre-identified indexed-twin consolidation
    # (above) or the bound flips to 4.
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
