"""End-to-end corpus pipelines — the composed jobs a 100 TB user runs,
as opposed to the per-operator declared queries.

`dedup_e2e_pipeline` chains the full near-dedup flow in ONE lazy plan:

    documents
      → MinHash-LSH candidate pairs     (map-side signatures, one
                                         (band, bucket) exchange)
      → exact-Jaccard verification      (two doc_id equi-joins)
      → connected-component clusters    (list-free star rounds,
                                         O(log n) bounded iterations)
      → representative selection        (min-doc_id per cluster)
      → quality/language curation gates (map-side JVM expressions)
      → per-language corpus accounting

Every stage is an already-oracle-verified operator (queries_llm.py
keys llm_dedup_minhash_lsh, llm_dedup_clusters, llm_corpus_curation);
this module adds no new semantics — it publishes the end-to-end
wall-clock of the composition, which is the number a training-data
pipeline actually budgets for. Benchmarked by bench.py as
`pipelines.dedup_e2e` (kept OUT of the headline total so round-over-
round baseline comparisons stay apples-to-apples).

Scale shape of the composition: no stage collects to the driver; the
cluster step's iterative shuffles dominate (by design — transitive
closure is the only super-linear stage), and everything before it
reduces the edge set to near-dup pairs only, so the closure runs on a
graph that is tiny relative to the corpus at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import dedup_clusters
from ..operators.text_analysis import quality_score, regex_token_count
from ..operators.text_dedup import minhash_candidate_pairs, verify_pairs_jaccard
from ..sources.tables import load_table

_JACCARD_THRESHOLD = 0.8
_QUALITY_MIN = 0.5


def dedup_e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → near-dup pairs → clusters → curated per-language
    accounting, one composed plan. Returns one row per language:
    (lang, docs_in, docs_kept, dups_removed, low_quality_removed,
    tokens_kept)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    verified = verify_pairs_jaccard(pairs, docs, _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_clusters(verified, docs.select("doc_id"))
    labeled = docs.join(clusters, "doc_id").select(
        "doc_id",
        "lang",
        "is_representative",
        quality_score(F.col("text")).alias("q"),
        regex_token_count(F.col("text")).cast("long").alias("toks"),
    )
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(
            (F.col("is_representative") & (F.col("q") >= _QUALITY_MIN)).cast("long")
        ).alias("docs_kept"),
        F.sum((~F.col("is_representative")).cast("long")).alias("dups_removed"),
        F.sum(
            (F.col("is_representative") & (F.col("q") < _QUALITY_MIN)).cast("long")
        ).alias("low_quality_removed"),
        F.sum(
            F.when(
                F.col("is_representative") & (F.col("q") >= _QUALITY_MIN),
                F.col("toks"),
            ).otherwise(F.lit(0))
        ).alias("tokens_kept"),
    )
