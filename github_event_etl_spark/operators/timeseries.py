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


def densify_buckets(
    agg: DataFrame,
    group_col: str,
    bucket_col: str,
    count_col: str,
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Dense (group, bucket) grid over the GLOBAL bucket span of `agg`,
    zero-filling combinations `agg` lacks. Returns columns
    (group_col, bucket_col, count_col) with count_col cast long.

    Plan shape: the bounds reduce `agg` to one row; the spine is
    sequence()/explode over that row; spine × distinct-groups is the
    bounded-domain broadcast cross (|groups|×|buckets| rows by
    construction, never an input-sized side); the counts come back
    through a left equi-join. Every input here is post-aggregate
    small — the corpus-sized work happened in the caller's groupBy."""
    bounds = agg.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(step))
        ).alias(bucket_col)
    )
    groups = agg.select(group_col).distinct()
    dense = spine.crossJoin(F.broadcast(groups))
    return dense.join(agg, [group_col, bucket_col], "left").select(
        group_col,
        bucket_col,
        F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias(
            count_col
        ),
    )
