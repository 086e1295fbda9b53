"""Skew mitigation: salted two-phase aggregation (SURVEY.md §2 B4 /
100 TB posture).

The reference's scoring key is (hour, actor) — fine-grained and
naturally spread. But real event streams aggregate on coarse hot keys
too (event_type: a handful of values over billions of rows), where a
single-shuffle groupBy sends every row of a hot key to one reducer.
Spark's map-side partial aggregation usually absorbs this for algebraic
aggregates; when the per-task key-group is still too large (high
cardinality payloads, collect-style aggs, or extreme single-key skew),
the classic fix is salting: spread each key over `n_salts` sub-keys,
aggregate partially per (key, salt), then merge the partials per key.

Both shuffles move only aggregated rows (≤ n_groups × n_salts), never
the raw data twice; the salt is deterministic (hash of the whole row,
not rand()) so replays and retries produce identical partitions —
rand() salts break task-retry determinism and the oracle value-hash.

AQE's skew-join splitting (enabled session-wide, session.py) handles
the JOIN side of skew; this module handles the AGGREGATE side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _contains_map(dt) -> bool:
    """True when MapType occurs ANYWHERE in the type — top level, array
    element, or struct field. Spark's hash expressions (xxhash64/hash)
    reject maps at any nesting depth, so exclusion must recurse the
    same way."""
    from pyspark.sql import types as _T

    if isinstance(dt, _T.MapType):
        return True
    if isinstance(dt, _T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, _T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def with_salt(df: DataFrame, n_salts: int, from_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n_salts): xxhash64 over
    `from_cols` (default: all columns). Deterministic per row content —
    identical inputs salt identically across retries and replays."""
    cols = from_cols or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation over salted sub-keys.

    `partial` maps output-column name -> aggregate over the raw rows,
    evaluated per (keys..., salt). `merge` maps final name -> aggregate
    over those partial columns, evaluated per (keys...). The caller
    picks a decomposition that is algebraically exact (sum of sums,
    sum of counts, min of mins, ...).

    Example — skew-safe count + sum + avg + min/max:

        partial = {"c": F.count(F.lit(1)), "s": F.sum("v"),
                   "mn": F.min("v"), "mx": F.max("v")}
        merge   = {"n_rows": F.sum("c"), "total": F.sum("s"),
                   "vmin": F.min("mn"), "vmax": F.max("mx")}
        salted_agg(df, ["k"], partial, merge)
        # avg afterwards: total / n_rows
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(name) for name, expr in partial.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def salted_count_sum(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """The common case: COUNT(*) + SUM(value) per key, skew-safe.
    Returns (keys..., n_rows, total)."""
    return salted_agg(
        df,
        keys,
        partial={
            "c": F.count(F.lit(1)),
            "s": F.sum(value_col),
        },
        merge={
            "n_rows": F.sum("c").cast("long"),
            "total": F.sum("s"),
        },
        n_salts=n_salts,
    )


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 32,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Manual salted equi-join for hot keys: the BIG side salts each
    row deterministically into `n_salts` sub-keys, the SMALL side
    replicates once per salt value, and the join runs on (key, salt) —
    a hot key's rows spread over `n_salts` reducers instead of one.
    Result equals `big.join(small, key, how)` exactly (pinned by the
    equality pytest); supported `how`: inner / left (the replicated
    side must be the one whose rows may fan out — a right/full variant
    would emit n_salts copies of unmatched small rows).

    When to use over AQE: AQE's skew-join splitting (on session-wide,
    session.py) already rebalances BATCH sort-merge joins at runtime
    and needs no hints — prefer it. This manual form is the portable
    fallback for the paths AQE cannot rebalance: stream-static and
    stream-stream joins (state-store partitioning is fixed by the
    plan, decided before any runtime statistics exist) and broadcast-
    ineligible small sides. The salt is content-deterministic
    (with_salt), so task retries and streaming replays partition
    identically.

    Cost model: small side storage ×n_salts (it is small — that is the
    premise), one exchange per side on (key, salt), no row of the big
    side duplicated.

    Salt derivation: pass `salt_cols` naming a per-row-unique column
    (an event id, an offset) whenever one exists — that guarantees the
    spread. The default hashes the big side's top-level HASHABLE
    columns (maps are excluded — Spark's hash expressions reject
    MapType, and a wide event schema with a map payload must not break
    the drop-in contract); the non-key hashable set must be non-empty,
    since salting by the key alone would give every row of a hot key
    the same salt. KNOWN LIMIT of the default: rows with IDENTICAL
    non-key content hash to one salt, so a hot key whose payload is
    also low-cardinality does not spread (it still pays the small-side
    replication) — that is the case for `salt_cols`. A nondeterministic
    per-row source (rand(), monotonically_increasing_id) is
    deliberately not used: it would break task-retry determinism and
    streaming-replay equality."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_skew_join supports how='inner'|'left', got {how!r}"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    clash = set(big.columns) & set(small.columns) - {key}
    if clash:
        raise ValueError(
            f"salted_skew_join: ambiguous non-key columns {sorted(clash)} — "
            "rename them on one side before joining"
        )
    if SALT_COL in big.columns or SALT_COL in small.columns:
        raise ValueError(
            f"salted_skew_join: inputs may not carry the reserved salt "
            f"column {SALT_COL!r}"
        )
    if salt_cols is not None:
        missing = [c for c in salt_cols if c not in big.columns]
        if missing:
            raise ValueError(
                f"salted_skew_join: salt_cols {missing} not in big side "
                f"columns {big.columns}"
            )
        # same MapType exclusion the default path applies: Spark's hash
        # expressions reject MapType ANYWHERE in the type (top-level,
        # array element, struct field), and failing here with the
        # operator's error beats an opaque xxhash64 analysis error later
        big_types = {f.name: f.dataType for f in big.schema.fields}
        unhashable = [
            c for c in salt_cols if _contains_map(big_types[c])
        ]
        if unhashable:
            raise ValueError(
                f"salted_skew_join: salt_cols {unhashable} contain "
                "MapType — Spark's hash expressions reject maps at any "
                "nesting level; name hashable columns (an event id, an "
                "offset) instead"
            )
        # the same key-exclusion rule the default path enforces: a
        # salt derived from the join key alone is constant per key —
        # every hot-key row lands in ONE bucket while still paying
        # the small-side replication (an easy slip, since salt_cols
        # and key both name columns)
        if not [c for c in salt_cols if c != key]:
            raise ValueError(
                "salted_skew_join: salt_cols must include at least one "
                f"non-key column, got {salt_cols!r} for key {key!r} — "
                "salting by the join key alone gives every row of a "
                "hot key the same salt"
            )
        hashable = list(salt_cols)
    else:
        hashable = [
            f.name
            for f in big.schema.fields
            if not _contains_map(f.dataType) and f.name != key
        ]
    if not hashable:
        raise ValueError(
            "salted_skew_join: big side has no hashable non-key column to "
            "derive the salt from"
        )
    b = with_salt(big, n_salts, from_cols=hashable)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")
    )
    s = small.select("*", salts.alias(SALT_COL))
    return b.join(s, [key, SALT_COL], how).drop(SALT_COL)
