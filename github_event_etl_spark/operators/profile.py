"""Column profiling — the engine's SUMMARIZE/data-quality surface.

Every serious analytics engine ships a one-call table profile (DuckDB
``SUMMARIZE``, Deequ/GE profilers); a training-data pipeline runs the
same scan as its ingest acceptance gate (null-rate and cardinality
drift catch upstream schema rot before it poisons a 100 TB corpus).
The reference has a monitoring read-side (README.md:143-176 — key
counts, stream length, sample entries) whose analytic generalization
is exactly a per-column profile.

Shape: ONE aggregation pass over the table computes every column's
row/null/distinct counts and min/max, then a map-side explode unpivots
the single wide row into one row per column. No joins, no second scan.

Exact-vs-approx distinct is the plan-shape decision:
- ``approx=False`` (default): exact ``count(DISTINCT col)`` — planned
  as ONE AGGREGATE PER COLUMN over a column-pruned scan, unioned. On
  columnar storage this reads exactly the same bytes as a single
  wide pass (each column once) while avoiding the Expand node a
  multi-distinct single pass would plan (Expand replicates every
  input row N+1 ways — measured 23.7 s vs ~2 s on an 11-column
  600k-row lineitem), and the per-column branches parallelize as
  independent jobs. Required for the DuckDB value-hash oracle.
- ``approx=True``: HyperLogLog ``approx_count_distinct`` — a single
  wide pass (no Expand exists without exact distincts), constant
  memory per column; the right default when ±2% cardinality is fine.
  Same output schema, so callers flip the flag without downstream
  changes.

Cost crossover, measured so nobody "fixes" it backwards: at LOCAL
scale the approx mode is the slower one (sf0.1 bench: 2.35 s vs the
exact mode's 1.62 s) — per-column HLL sketch maintenance costs more
than small exact hash sets, and the per-column-union exact plan reads
the same parquet bytes anyway. Approx still wins at cluster scale:
constant memory per column regardless of cardinality (exact distinct
sets grow with the data and spill), and ONE pass over row-oriented
sources the exact mode would re-parse once per column. Do not
re-plan the exact mode as a single multi-distinct pass to chase the
local number — that reintroduces the Expand (23.7 s, above).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.timeutil import ts_string

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column: (col_name, dtype, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str).

    min/max land in ``min_num``/``max_num`` (double) for numeric
    columns and ``min_str``/``max_str`` for strings; timestamps format
    through the repo's fixed microsecond pattern into the ``_str``
    pair. The double casts are hash-safe across engines because
    min/max return STORED values — no arithmetic, so no float-rounding
    divergence. n_nulls is ``n_rows − count(col)`` (count skips nulls)
    rather than a CASE sum, in both this plan and the oracle.

    Source-format caveat: exact mode's 'same bytes as a wide pass'
    equivalence is a COLUMNAR-storage fact; a row-oriented source
    (CSV/JSON, or an unpersisted in-memory frame) gets re-parsed once
    per column by the per-column branches. Profiling such inputs:
    use ``approx=True`` (single pass) or land them to parquet first —
    which a pipeline at scale does anyway.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"profile_columns: unknown columns {unknown}")

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def shaped_minmax(c: str, lo, hi):
        """THE min/max type dispatch, shared by both modes: `lo`/`hi`
        are the raw min/max expressions (aggregates in exact mode, the
        wide row's columns in approx mode); returns the four shaped
        output columns (min_num, max_num, min_str, max_str)."""
        dt = fields[c]
        if isinstance(dt, _NUMERIC):
            return lo.cast("double"), hi.cast("double"), null_s, null_s
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return null_d, null_d, ts_string(lo), ts_string(hi)
        return null_d, null_d, lo.cast("string"), hi.cast("string")

    if not approx:
        # exact mode: one column-pruned aggregate per column, unioned —
        # same bytes read as a single wide pass on columnar storage,
        # no Expand (see module docstring)
        out = None
        for c in cols:
            mi_n, ma_n, mi_s, ma_s = shaped_minmax(
                c, F.min(F.col(c)), F.max(F.col(c))
            )
            branch = df.select(c).agg(
                F.lit(c).alias("col_name"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                mi_n.alias("min_num"),
                ma_n.alias("max_num"),
                mi_s.alias("min_str"),
                ma_s.alias("max_str"),
            )
            out = branch if out is None else out.unionAll(branch)
        return out

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).alias(f"_mi_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_ma_{c}"))
    wide = df.agg(*aggs)

    structs = []
    for c in cols:
        mi_n, ma_n, mi_s, ma_s = shaped_minmax(
            c, F.col(f"_mi_{c}"), F.col(f"_ma_{c}")
        )
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                mi_n.alias("min_num"),
                ma_n.alias("max_num"),
                mi_s.alias("min_str"),
                ma_s.alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def winsorize_stats(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> "DataFrame":
    """Per-group winsorization (quantile-clip) statistics: each group's
    DISCRETE [lo_q, hi_q] percentile bounds, total row count, counts
    clipped at each side, and the decimal-exact sum of the clamped
    values — the two-pass robust-scaling primitive behind the catalog
    key `agg_quantile_clip` (see its docstring for the cross-engine
    determinism argument: percentile_disc bounds are DATA values, so
    no interpolation ulp can flip a clamp comparison).

    NULL policy: a NULL reading stays NULL — missing, not an outlier —
    so it joins `n` but neither clip count nor the clipped sum; the
    explicit isNotNull guard matters because least/greatest SKIP nulls
    and would otherwise substitute the lo bound (manufactured data).

    Scale shape: pass 1 aggregates (group -> bounds) over a two-column
    pruned scan; pass 2 broadcasts the bounds back (never a corpus
    shuffle) and clamps inside whole-stage codegen before the final
    partial+final hash aggregate."""
    vals = df.select(group_col, value_col)
    bounds = vals.groupBy(group_col).agg(
        F.expr(
            f"percentile_disc({lo_q}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("lo"),
        F.expr(
            f"percentile_disc({hi_q}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("hi"),
    )
    joined = vals.join(F.broadcast(bounds), group_col)
    v = F.col(value_col)
    clamped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    )
    return joined.groupBy(group_col).agg(
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count_if(v < F.col("lo")).alias("n_clip_low"),
        F.count_if(v > F.col("hi")).alias("n_clip_high"),
        F.sum(clamped.cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_clipped"),
    )
