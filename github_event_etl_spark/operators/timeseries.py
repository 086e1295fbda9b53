"""Time-series densification (gap-fill).

The timeseries-database `time_bucket_gapfill` / `GROUP BY ... FILL`
operator Spark lacks as a builtin, composed from sequence + explode:
given an already-aggregated (group, bucket, count) frame, emit the
COMPLETE dense grid over [global min bucket, global max bucket] with
missing buckets as explicit zero rows. Dashboards, anomaly detectors
and join-by-time consumers need the dense spine — a silent bucket is
indistinguishable from a lost partition otherwise. Reference analog:
the hourly score keys (update-contributor-scores.js:12-18) imply
exactly this dense hour domain.

Deliberately takes the AGGREGATE, not the raw corpus: densification
is a post-aggregate operation on bounded cardinalities
(|groups| × |buckets|), and the caller owns how the aggregate is
materialized (the catalog's `gapfill_hourly` persists it so its three
consumers share one corpus scan — see that query's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dense_join(
    agg: DataFrame,
    group_col: str,
    bucket_col: str,
    step: str,
    validate_alignment: bool,
) -> DataFrame:
    """Shared core of the two densify faces: the complete
    (group, bucket) grid over the GLOBAL bucket span of `agg`,
    left-joined back to `agg` (missing combinations carry nulls in
    every `agg` value column — each face decides what a null means).

    ALIGNMENT PRECONDITION: every input bucket must lie ON the
    min-anchored step grid — the spine is sequence(min, max, step), so
    an off-grid bucket (e.g. an hour-and-a-half value under an hourly
    step) never matches the left join and its values are silently
    replaced by the face's fill. Inputs produced by
    date_trunc/time-bucket aggregation satisfy this by construction
    (truncation quantizes every bucket onto the grid, and min is
    itself a bucket); `validate_alignment=True` (debug; costs one
    extra job) asserts it — an anti-join of input buckets against the
    spine must be empty, else ValueError.

    Empty input yields an EMPTY result (no spine to densify): the
    bounds row is filtered on `lo IS NOT NULL` so the degenerate case
    is an explicit zero-row spine, not `sequence(null, null)`
    semantics.

    Plan shape: the bounds reduce `agg` to one row; the spine is
    sequence()/explode over that row; spine × distinct-groups is the
    bounded-domain broadcast cross (|groups|×|buckets| rows by
    construction, never an input-sized side); the values come back
    through a left equi-join. Every input here is post-aggregate
    small — the corpus-sized work happened in the caller's groupBy."""
    bounds = agg.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    ).where(F.col("lo").isNotNull())
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(step))
        ).alias(bucket_col)
    )
    if validate_alignment:
        off_grid = (
            agg.select(bucket_col)
            .distinct()
            .join(spine, bucket_col, "left_anti")
            .limit(5)
            .collect()
        )
        if off_grid:
            raise ValueError(
                "densify: input buckets off the min-anchored "
                f"{step} grid (first {len(off_grid)}): "
                f"{[r[0] for r in off_grid]}"
            )
    groups = agg.select(group_col).distinct()
    dense = spine.crossJoin(F.broadcast(groups))
    return dense.join(agg, [group_col, bucket_col], "left")


def densify_buckets(
    agg: DataFrame,
    group_col: str,
    bucket_col: str,
    count_col: str,
    step: str = "INTERVAL 1 HOUR",
    validate_alignment: bool = False,
) -> DataFrame:
    """Dense (group, bucket) grid over the GLOBAL bucket span of `agg`,
    ZERO-filling combinations `agg` lacks — the COUNT flavor (a silent
    hour genuinely had zero events). Returns columns
    (group_col, bucket_col, count_col) with count_col cast long.
    Grid semantics, alignment precondition, empty-input contract and
    plan shape: see `_dense_join`."""
    return _dense_join(
        agg, group_col, bucket_col, step, validate_alignment
    ).select(
        group_col,
        bucket_col,
        F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias(
            count_col
        ),
    )


def densify_values(
    agg: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
    step: str = "INTERVAL 1 HOUR",
    validate_alignment: bool = False,
) -> DataFrame:
    """Dense (group, bucket) grid over the GLOBAL bucket span of `agg`,
    keeping missing combinations NULL — the READING flavor (a silent
    hour has no observation, not a zero one; zero-filling a
    temperature or a mean price would corrupt it). Pair with
    `fill_forward` (locf) or `interpolate_linear` to fill the nulls.
    Returns columns (group_col, bucket_col, value_col), value type
    unchanged. Grid semantics, alignment precondition, empty-input
    contract and plan shape: see `_dense_join`."""
    return _dense_join(
        agg, group_col, bucket_col, step, validate_alignment
    ).select(group_col, bucket_col, value_col)


def fill_forward(
    dense: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Last-observation-carried-forward over a dense bucket grid: null
    `value_col` entries take the most recent non-null value within
    their group (timeseries `locf`; buckets before a group's first
    observation stay null). Pairs with `densify_values` (the
    null-preserving grid) when the filled quantity is a reading to
    hold — NOT with `densify_buckets`, whose zero-fill leaves no
    nulls to carry.

    One exchange: the per-group window sorts once and
    last(ignorenulls) scans the frame incrementally."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(
        value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def interpolate_linear(
    dense: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation over a dense TIMESTAMP bucket grid: null
    `value_col` entries take the value linearly interpolated between
    the nearest earlier and later non-null observations in their group
    (timeseries `interpolate`). Head gaps (no earlier observation)
    extend the first observation backward; tail gaps extend the last
    forward; a group with no observations stays null.

    Plan shape: both passes share ONE partitioning and ONE ascending
    sort (the backward frame reads unboundedPreceding..current, the
    forward frame current..unboundedFollowing over the same sort), so
    Catalyst plans a single Exchange + single Sort feeding a SINGLE
    Window node evaluating both frames (plan-gated in
    tests/test_plans.py). Time arithmetic runs on microsecond longs — exact
    integers — and the interpolation computes the RATIO
    (t-prev)/(next-prev) first: with exact integer operands the
    quotient is identical under any linear rescaling of the time
    axis, so the result is unit-invariant (micros, millis, hours all
    yield the bit-same double), which multiply-before-divide would
    not be."""
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.unix_micros(F.col(bucket_col)).alias("t"),
            F.col(value_col).alias("v"),
        ),
    )
    pb = Window.partitionBy(group_col).orderBy(bucket_col)
    w_back = pb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = pb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev = F.last(obs, ignorenulls=True).over(w_back)
    nxt = F.first(obs, ignorenulls=True).over(w_fwd)
    t = F.unix_micros(F.col(bucket_col))
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(prev.isNull(), nxt["v"])
        .when(nxt.isNull(), prev["v"])
        .otherwise(
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (
                (t - prev["t"]).cast("double")
                / (nxt["t"] - prev["t"]).cast("double")
            )
        )
    )
    return dense.withColumn(value_col, filled)
