"""Capped-vocabulary scoring tables — the broadcast-safety valve for
corpus-LM scoring (llm_rarity_score) and tf-idf featurization
(llm_tfidf_topk).

Both queries broadcast a per-token table (unigram counts / document
frequencies) back onto the corpus token stream so the corpus-sized
side never reshuffles on the skewed token key. On a 100 TB web corpus
the distinct-token set (URLs, hex blobs, typos) reaches billions of
rows — a vocabulary-sized broadcast blows past any broadcast limit and
fails the job. The standard fallback caps the broadcast at the top-K
tokens by count and scores everything else through an
out-of-vocabulary (OOV) floor chosen so aggregate probability mass is
preserved: floor = the average per-type count of the excluded tail
(clamped to >= 1), i.e. an OOV token is scored as an average member of
the bucket it fell into.

Exact top-K over a billion-row vocabulary is itself a scale trap:
`orderBy().limit(K)` plans TakeOrderedAndProject (the driver merges K
rows PER PARTITION — dead at K=10^6 x 2000 partitions) or, past the
top-K fallback threshold, a full global sort. `top_count_vocab` picks
the K-th-count THRESHOLD off a count histogram instead: the histogram
is tiny by Zipf (distinct count VALUES are orders of magnitude fewer
than distinct tokens), the threshold attaches as a one-row broadcast,
everything strictly above it is a map-side filter, and only the
boundary tie band (count == threshold) pays a deterministic
token-ordered row_number to fill the remaining slots. The selection is
exactly `orderBy(count DESC, tok).limit(cap)` — same rows, no
driver-side merge, no full-vocab sort.

Worst case: the cap lands inside a huge tie band (the count==1
singleton band can hold billions of junk tokens). The tie-band
selection is two-phase for exactly this case: a per-partition local
prune to the slot count first, then the global rank over at most
slots x partitions rows — bounded by the CAP rather than the band, and
sorted executor-side (spillable) rather than driver-merged. Production
configs still avoid landing there by construction — the singleton band
is the junk the cap exists to exclude — but a degenerate corpus now
degrades to a bounded sort instead of a single-partition band sort.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_count_vocab(
    tf: DataFrame, count_col: str, cap: int, key_col: str = "tok"
) -> DataFrame:
    """Exactly the `cap` rows of `tf` with the highest `count_col`,
    ties broken by ascending `key_col` — the same rows as
    `tf.orderBy(count desc, key).limit(cap)`, selected without a
    driver-side top-K merge or a full-vocab sort (module docstring).

    Deterministic and engine-mirrorable: the DuckDB oracle expresses
    the identical selection as `QUALIFY row_number() OVER (ORDER BY
    count DESC, key) <= cap`.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    hist = tf.groupBy(count_col).agg(F.count(F.lit(1)).alias("_n"))
    # Cumulative vocab size STRICTLY above each count value. The
    # histogram is tiny, so the single-partition window is free.
    w = (
        Window.orderBy(F.col(count_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "_before", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
    )
    # Threshold = smallest count that still has slots left; the rows
    # above it fill `_before` slots, leaving `cap - _before` for the
    # threshold's own tie band.
    thr = cum.filter(F.col("_before") < cap).agg(
        F.min(count_col).alias("_thr"),
        (F.lit(cap).cast("long") - F.coalesce(F.max("_before"), F.lit(0))).alias(
            "_slots"
        ),
    )
    t = tf.crossJoin(F.broadcast(thr))
    above = t.filter(F.col(count_col) > F.col("_thr")).select(key_col, count_col)
    # Tie band: two-phase executor-side selection of the band's
    # `_slots` smallest keys. Phase 1 prunes EACH PARTITION to its own
    # `_slots` smallest (a row whose local rank exceeds `_slots`
    # already has `_slots` smaller keys beside it, so its global rank
    # exceeds `_slots` too — correct under ANY partitioning, so the
    # nondeterminism of partition ids across re-executions cannot
    # change the result). Phase 2's global row_number then sorts at
    # most `_slots` x num_partitions rows — bounded by the CAP, not
    # the band, and it spills executor-side where the driver-merge
    # TakeOrdered pattern would die. The selected rows are exactly
    # `orderBy(key).limit(slots)` of the band.
    wb_local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col(key_col)
    )
    wb_global = Window.orderBy(F.col(key_col))
    band = (
        t.filter(F.col(count_col) == F.col("_thr"))
        .withColumn("_lrn", F.row_number().over(wb_local))
        .filter(F.col("_lrn") <= F.col("_slots"))
        .withColumn("_rn", F.row_number().over(wb_global))
        .filter(F.col("_rn") <= F.col("_slots"))
        .select(key_col, count_col)
    )
    return above.unionAll(band)


def capped_count_table(
    tf: DataFrame, count_col: str, cap: Optional[int], key_col: str = "tok"
) -> tuple[DataFrame, DataFrame]:
    """The (scoring_table, scalars) pair the scoring joins consume.

    scoring_table: the full per-token table when `cap` is None (test-SF
    / small-vocab mode — bit-identical to the uncapped query), else its
    exact top-`cap` rows by (count DESC, key). This is the ONLY side
    that gets broadcast, so the broadcast is bounded by `cap` rows
    regardless of corpus vocabulary.

    scalars: one row, (total, oov_floor): `total` is the FULL-vocab
    count mass (so capped scoring keeps the same normalizer as
    uncapped), `oov_floor` the average per-type count of the excluded
    tail, clamped to >= 1 — substituted for any token missing from the
    scoring table. With cap >= vocab size (or None) no token is ever
    missing and the floor is inert, which is what keeps the capped
    plan hash-identical to the uncapped oracle at small SFs.

    All derived tables reuse `tf`'s aggregation subtree; Catalyst's
    exchange reuse collapses the repeated scans into one shuffle.
    """
    totals = tf.agg(
        F.coalesce(F.sum(count_col), F.lit(0)).cast("long").alias("_total"),
        F.count(F.lit(1)).alias("_types"),
    )
    if cap is None:
        scal = totals.select(
            F.col("_total").alias("total"),
            F.lit(1).cast("long").alias("oov_floor"),
        )
        return tf, scal
    kept = top_count_vocab(tf, count_col, cap, key_col)
    kept_tot = kept.agg(
        F.coalesce(F.sum(count_col), F.lit(0)).cast("long").alias("_kt"),
        F.count(F.lit(1)).alias("_kn"),
    )
    scal = totals.crossJoin(F.broadcast(kept_tot)).select(
        F.col("_total").alias("total"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr("(_total - _kt) div greatest(1L, _types - _kn)"),
        ).alias("oov_floor"),
    )
    return kept, scal


def unigram_rarity(
    toks: DataFrame, vocab_cap: Optional[int] = None
) -> DataFrame:
    """(doc_id, n_toks, rarity_sum): summed inverse unigram probability
    in micros — floor(total * 1e6 / count) per token, all-integer (see
    llm_rarity_score for the no-doubles rationale). `toks` is the
    exploded (doc_id, tok) stream.

    With `vocab_cap`, the unigram table broadcast onto the token
    stream is its exact top-`vocab_cap` tokens by count and every
    excluded token scores through the mass-preserving OOV floor
    (module docstring) — the broadcast is cap-bounded at any corpus
    size, and `total` still normalizes over the FULL vocabulary so
    in-vocab scores are unchanged by capping.
    """
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    lm, scal = capped_count_table(tf, "tf", vocab_cap)
    scored = (
        toks.join(F.broadcast(lm), "tok", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            F.expr("(total * 1000000L) div coalesce(tf, oov_floor)").alias(
                "rarity_micros"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("rarity_micros").alias("rarity_sum"),
    )


def tfidf_topk(
    tfd: DataFrame,
    n_docs: DataFrame,
    k: int,
    vocab_cap: Optional[int] = None,
) -> DataFrame:
    """(doc_id, tok, score_micros, rnk): top-`k` characteristic terms
    per document by integer tf-idf — score = tf * floor(N * 1e6 / df),
    deterministic (score DESC, tok) tie-break. `tfd` is the per-doc
    term-frequency table (doc_id, tok, tf); `n_docs` a one-row (n_docs)
    DataFrame.

    With `vocab_cap`, the broadcast document-frequency table is its
    exact top-`vocab_cap` tokens by df; excluded (rare) tokens take
    the average-of-tail OOV df floor — they stay scoreable and rank
    high, as rare terms should, while the broadcast stays cap-bounded.
    """
    dfc = tfd.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    dtab, scal = capped_count_table(dfc, "df", vocab_cap)
    scored = (
        tfd.join(F.broadcast(dtab), "tok", "left")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * F.expr("(n_docs * 1000000L) div coalesce(df, oov_floor)")
            ).alias("score_micros"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micros").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "tok", "score_micros", "rnk")
    )
