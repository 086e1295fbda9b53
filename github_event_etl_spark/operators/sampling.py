"""Deterministic corpus sampling operators.

The hash-assignment samplers (train/val/test split, mixture
rebalancing) live inline in plans/queries_llm.py — they are single
map-side projections. This module holds the samplers with real plan
logic.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U32_SPACE = 1 << 32


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    oversample: int = 4,
) -> DataFrame:
    """Exact-quota stratified sample: the `quota` rows with the
    smallest md5(id) per stratum — how a balanced eval/calibration set
    is cut from a skewed corpus ("exactly 1,000 docs per language").
    Deterministic like the hash-assignment samplers (a pure function
    of the stable ids: no RNG, no seed coordination, identical across
    runs, engines, and cluster sizes) — but NOT append-stable: exact
    quotas are rank-based, so growing a stratum can displace members;
    use the threshold samplers when old assignments must never change.

    Scale shape — never sorts a stratum. A naive per-stratum
    row_number is a full sort of the largest stratum (billions of rows
    to pick 1,000 at 100 TB). Instead: (1) one map-side-partial count
    per stratum; (2) an integer keep-threshold
    (oversample·quota·2³²) div n + 1 broadcast back onto the corpus;
    (3) a map-side prefilter keeps ~oversample·quota candidates per
    stratum — every member of the true top-quota survives whenever at
    least `quota` hashes clear the threshold (shortfall probability
    exp(−Θ(quota)) by Chernoff; a stratum smaller than the quota is
    kept whole, the threshold exceeds the u32 space); (4) row_number
    over (md5, id) on the candidate set. Every post-count shuffle is
    candidate-sized. Fixed-width lowercase hex sorts like the number
    it encodes, so the u32-prefix prefilter and the full-digest rank
    order can never disagree. The prefilter rule is integer-exact and
    engine-portable — a DuckDB oracle applies the identical rule, so
    results match even in the astronomically-unlikely shortfall case.

    Output: (id, stratum, rank_r, stratum_n) with rank_r ∈ 1..quota
    per stratum and stratum_n the stratum's TOTAL corpus count (free —
    it feeds the threshold anyway). stratum_n makes a shortfall
    detectable from the output alone instead of surfacing downstream
    as an undersized eval set: a stratum came up short iff its row
    count is below least(quota, stratum_n) — the recommended
    post-check is `GROUP BY stratum
    HAVING count(*) < least(quota, any_value(stratum_n))`.
    """
    h = F.md5(F.col(id_col).cast("string"))
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    total = oversample * quota * _U32_SPACE
    thresholds = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            strata_col,
            "_n",
            (F.expr(f"{total} div _n") + F.lit(1)).alias("_thr"),
        )
    )
    candidates = (
        df.select(F.col(id_col), F.col(strata_col))
        .join(F.broadcast(thresholds), strata_col)
        .filter(u32 < F.col("_thr"))
        .drop("_thr")
    )
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col("_rn").cast("long").alias("rank_r"),
            F.col("_n").cast("long").alias("stratum_n"),
        )
    )
