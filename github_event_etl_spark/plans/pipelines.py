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
      → substring-level span dedup      (shared-gram membership
                                         counting over the KEPT docs,
                                         never doc×doc)
      → span-removal rewrite            (left-semi range join,
                                         order-free reassembly)
      → per-language corpus accounting

Every stage is an already-oracle-verified operator (queries_llm.py
keys llm_dedup_minhash_lsh, llm_dedup_clusters, llm_corpus_curation,
llm_span_dedup, llm_span_removed); this module adds no new semantics —
it publishes the end-to-end wall-clock of the composition, which is
the number a training-data pipeline actually budgets for. Benchmarked
by bench.py as `pipelines.dedup_e2e` (kept OUT of the headline total
so round-over-round baseline comparisons stay apples-to-apples).

Scale shape of the composition: no stage collects to the driver; the
cluster step's iterative shuffles dominate (by design — transitive
closure is the only super-linear stage), and everything before it
reduces the edge set to near-dup pairs only, so the closure runs on a
graph that is tiny relative to the corpus at any scale. The span stage
runs AFTER document-level dedup and curation on purpose: it scans only
the kept corpus (smaller), and dropping whole duplicate documents
first means their passages never inflate the gram df counts.

`incremental_e2e_pipeline` (r15) is the daily-increment counterpart:
the three incremental classify twins (exact hash / MinHash-LSH /
RHP-semantic, one shared skeleton) composed as a cheapest-test-first
waterfall over an 80/20 split, benched as `pipelines.incremental_e2e`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import dedup_clusters
from ..operators.similarity import incremental_dedup_semantic
from ..operators.text_analysis import quality_score, regex_token_count
from ..operators.text_dedup import (
    duplicated_spans,
    incremental_dedup,
    incremental_dedup_minhash,
    minhash_candidate_pairs,
    remove_spans,
    verify_pairs_jaccard,
    words,
)
from ..sources.tables import load_table

_JACCARD_THRESHOLD = 0.8
_QUALITY_MIN = 0.5
_SPAN_K = 5
_SPAN_MIN_GRAMS = 3
_SPAN_MAX_DF = 10_000


def dedup_e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → near-dup pairs → clusters → curation → span-level
    dedup of the kept corpus, one composed plan. Returns one row per
    language: (lang, docs_in, docs_kept, dups_removed,
    low_quality_removed, span_tokens_removed, tokens_kept), where
    tokens_kept counts whitespace tokens AFTER span removal, so
    per-language: tokens_kept + span_tokens_removed = tokens of the
    kept documents (the conservation pytest pins this).
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs)
    verified = verify_pairs_jaccard(pairs, docs, _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_clusters(verified, docs.select("doc_id"))
    # Materialization point: FOUR consumers fan out from here (counts,
    # span detection, span removal, token accounting), and Catalyst
    # does not dedupe the repeated subtree — unchecked, the composed
    # plan re-executes the jaccard-verify join and quality gates once
    # per consumer (measured: 28 documents scans in the un-checkpointed
    # plan). One eager checkpoint truncates the lineage so every
    # consumer reads the computed rows — but it materializes ONLY the
    # scalar verdict columns (doc_id, lang, is_representative, q),
    # never the text: the count consumers don't need text at all, and
    # the span branch re-attaches it below for just the kept docs via
    # one cheap doc_id equi-join back to the parquet scan (column-
    # pruned to (doc_id, text); re-reading a column from columnar
    # storage beats holding every document body in block-manager
    # memory — at 100 TB the text column IS the corpus). Local-mode
    # blocks suffice here; a cluster run sets a SparkContext
    # checkpoint dir upstream (dedup_clusters already honors it) or
    # persists to DISK — the recompute-vs-materialize call the span
    # operator's docstring discusses, decided for materialize because
    # the upstream includes a multi-join verify stage, not a map-only
    # derivation.
    labeled = docs.join(clusters, "doc_id").select(
        "doc_id",
        "lang",
        "is_representative",
        quality_score(F.col("text")).alias("q"),
    )
    labeled = labeled.localCheckpoint(eager=True)
    counts = labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(
            (F.col("is_representative") & (F.col("q") >= _QUALITY_MIN)).cast("long")
        ).alias("docs_kept"),
        F.sum((~F.col("is_representative")).cast("long")).alias("dups_removed"),
        F.sum(
            (F.col("is_representative") & (F.col("q") < _QUALITY_MIN)).cast("long")
        ).alias("low_quality_removed"),
    )
    # Substring-level pass over the KEPT corpus only: detect passages
    # duplicated across otherwise-distinct kept documents and rewrite
    # them out. Token accounting uses the same whitespace tokenization
    # remove_spans rewrites with, so conservation is exact. Text is
    # re-attached here (kept docs only) from the pruned parquet scan;
    # the three downstream consumers each replay this cheap join
    # against the materialized verdicts rather than the verify stage.
    kept = (
        labeled.filter(
            F.col("is_representative") & (F.col("q") >= _QUALITY_MIN)
        )
        .select("doc_id", "lang")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    spans = duplicated_spans(
        kept.select("doc_id", "text"),
        k=_SPAN_K,
        min_grams=_SPAN_MIN_GRAMS,
        max_df=_SPAN_MAX_DF,
    )
    rewritten = remove_spans(kept.select("doc_id", "text"), spans)
    token_stats = (
        kept.select("doc_id", "lang")
        .join(rewritten, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_removed_tokens").alias("span_tokens_removed"),
            F.sum(
                F.when(F.trim(F.col("text")) == "", F.lit(0))
                .otherwise(F.size(words(F.col("text"))))
                .cast("long")
            ).alias("tokens_kept"),
        )
    )
    return counts.join(token_stats, "lang", "left").select(
        "lang",
        "docs_in",
        "docs_kept",
        "dups_removed",
        "low_quality_removed",
        F.coalesce("span_tokens_removed", F.lit(0)).alias(
            "span_tokens_removed"
        ),
        F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
    )


# ------------------------------------------------- incremental e2e pipeline

_INCR_E2E_BATCH_SPLIT = 8  # doc_id % 10 >= 8 → the daily 20% increment
_INCR_E2E_JACCARD = 0.8
_INCR_E2E_COSINE = 0.98
_INCR_E2E_SEM_TABLES = 12
_INCR_E2E_SEM_PLANES = 12
# MinHash stage geometry + the degenerate-bucket cap for BOTH LSH
# stages, passed explicitly (never left to operator defaults): the
# composition's DuckDB oracle (queries_llm.llm_incremental_e2e_report)
# mirrors EVERY one of these — a default retuned in the operator would
# otherwise silently desynchronize the composition from its oracle.
_INCR_E2E_NUM_BANDS = 4
_INCR_E2E_ROWS_PER_BAND = 3
_INCR_E2E_SHINGLE_K = 3
_INCR_E2E_MAX_BUCKET = 10_000


def incremental_e2e_classify(
    corpus_docs: DataFrame,
    batch_docs: DataFrame,
    corpus_emb: DataFrame,
    batch_emb: DataFrame,
    checkpoint: bool = True,
) -> DataFrame:
    """The daily-increment waterfall, one composed plan over the three
    incremental twins (all built on the shared
    `_incremental_classify_lsh` / broadcast-semi-filter skeleton, so
    this composition exercises the whole family under one optimizer
    pass): classify each incoming batch doc

        exact content hash   → 'exact'    dup_corpus / dup_batch
        else MinHash-LSH     → 'minhash'  dup_corpus / dup_batch
        else RHP-LSH cosine  → 'semantic' dup_corpus / dup_batch
        else                 → 'none'     new

    cheapest-test-first, each stage seeing only the docs the previous
    stage could not resolve — exactly how a production increment runs
    (nobody MinHashes content an exact hash already matched). Returns
    one row per batch doc: (doc_id, stage, status, matched_id); the
    conservation pytest pins "every batch doc exactly one row".

    The semantic stage classifies through the embeddings table
    (vec_id = doc_id); remaining docs WITHOUT an embedding fall
    through to 'none'/'new' — at 100 TB the embedding join is a
    left-semi-shaped id equi-join, never a corpus shuffle.

    Materialization points (the dedup_e2e convention): each stage's
    verdict frame is eagerly localCheckpoint-ed SCALARS-ONLY (doc_id,
    status, matched id — never text, never vectors). Without it the
    next stage's batch subtree — which the classify skeleton
    deliberately plans ~3× — would nest the ENTIRE previous stage's
    join tree inside each copy, multiplying corpus scans ~3× per
    stage; with it each stage replays at most a cheap id equi-join
    back to the pruned parquet scan. Cluster runs swap localCheckpoint
    for a checkpoint dir or DISK persist, same as dedup_e2e.
    `checkpoint=False` keeps the whole waterfall ONE lazy plan — the
    plan gate uses it so its assertions see all three stages, not the
    ExistingRDD stubs the checkpoints leave behind.

    Remainders are derived by ANTI-JOINING each stage's input ids
    against that stage's resolved set — never by filtering the
    stage's own output for 'new'. The two differ exactly on rows a
    stage cannot emit a verdict for: a NULL-text doc hashes to a NULL
    content_hash and falls out of the exact twin's equi-join
    entirely, so an output-filter remainder would drop it from the
    waterfall (no row at all, breaking the one-status-per-doc
    conservation contract); the anti-join remainder carries it
    forward to the later stages and, if nothing resolves it, the
    'none'/'new' fall-through."""
    mat = (
        (lambda df: df.localCheckpoint(eager=True))
        if checkpoint
        else (lambda df: df)
    )
    batch_ids = batch_docs.select("doc_id")

    exact_st = mat(
        incremental_dedup(corpus_docs, batch_docs).select(
            "doc_id",
            "status",
            F.col("first_seen_doc_id").alias("matched_id"),
        )
    )
    resolved_exact = exact_st.filter(F.col("status") != "new").select(
        "doc_id", F.lit("exact").alias("stage"), "status", "matched_id"
    )
    rem_after_exact = batch_ids.join(
        resolved_exact.select("doc_id"), "doc_id", "left_anti"
    )

    batch_near = batch_docs.join(rem_after_exact, "doc_id")
    near_st = mat(
        incremental_dedup_minhash(
            corpus_docs,
            batch_near,
            threshold=_INCR_E2E_JACCARD,
            num_bands=_INCR_E2E_NUM_BANDS,
            rows_per_band=_INCR_E2E_ROWS_PER_BAND,
            k=_INCR_E2E_SHINGLE_K,
            max_bucket_size=_INCR_E2E_MAX_BUCKET,
            # inside the waterfall each stage's batch subtree nests the
            # previous stage's remainder, so the ~3x-replanned batch
            # banding multiplies the whole upstream — materialize the
            # scalars-only band keys (r22 measured win, see the
            # skeleton docstring); follows `checkpoint` so the lazy
            # plan gate still sees the full tree
            materialize_batch_bands=checkpoint,
        ).select(
            "doc_id", "status", F.col("matched_doc_id").alias("matched_id")
        )
    )
    resolved_near = near_st.filter(F.col("status") != "new").select(
        "doc_id", F.lit("minhash").alias("stage"), "status", "matched_id"
    )
    rem_after_near = rem_after_exact.join(
        resolved_near.select("doc_id"), "doc_id", "left_anti"
    )

    batch_vec = batch_emb.join(
        rem_after_near.withColumnRenamed("doc_id", "vec_id"), "vec_id"
    )
    # stage 3's verdicts feed TWO consumers (the final union and the
    # remainder anti-join below), so it is materialized like the other
    # stages — without it the most expensive stage's join tree is
    # planned, and partially re-executed, once per consumer
    sem_st = mat(
        incremental_dedup_semantic(
            corpus=corpus_emb,
            batch=batch_vec,
            dim=64,
            threshold=_INCR_E2E_COSINE,
            num_tables=_INCR_E2E_SEM_TABLES,
            planes_per_table=_INCR_E2E_SEM_PLANES,
            max_bucket_size=_INCR_E2E_MAX_BUCKET,
            materialize_batch_bands=checkpoint,
        ).select(
            F.col("vec_id").alias("doc_id"),
            "status",
            F.col("matched_vec_id").alias("matched_id"),
        )
    )
    sem_resolved = sem_st.filter(F.col("status") != "new").select(
        "doc_id", F.lit("semantic").alias("stage"), "status", "matched_id"
    )
    # everything stage 3 resolved leaves the remainder; docs with no
    # embedding never entered stage 3 and stay here too
    unresolved = rem_after_near.join(
        sem_resolved.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.lit("none").alias("stage"),
        F.lit("new").alias("status"),
        F.lit(None).cast("long").alias("matched_id"),
    )
    return (
        resolved_exact.unionByName(resolved_near)
        .unionByName(sem_resolved)
        .unionByName(unresolved)
    )


def incremental_e2e_report(
    docs: DataFrame, emb: DataFrame, checkpoint: bool = True
) -> DataFrame:
    """80/20 split (`doc_id % 10 >= _INCR_E2E_BATCH_SPLIT`) + waterfall
    classify + the merged (stage, status, n_docs) report, over GIVEN
    documents/embeddings frames — ONE copy of the split/report wiring,
    shared by the natural-table benched pipeline below and the catalog
    key's planted fixture (queries_llm.llm_incremental_e2e_report),
    the `_incrm_split` fixture-lives-once rule applied to the
    composition."""
    doc_is_batch = (F.col("doc_id") % 10) >= _INCR_E2E_BATCH_SPLIT
    vec_is_batch = (F.col("vec_id") % 10) >= _INCR_E2E_BATCH_SPLIT
    per_doc = incremental_e2e_classify(
        corpus_docs=docs.filter(~doc_is_batch),
        batch_docs=docs.filter(doc_is_batch),
        corpus_emb=emb.filter(~vec_is_batch),
        batch_emb=emb.filter(vec_is_batch),
        checkpoint=checkpoint,
    )
    return (
        per_doc.groupBy("stage", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("stage", "status")
    )


def incremental_e2e_pipeline(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """The composed daily-increment job over the real (un-planted)
    tables: the exact → MinHash → semantic waterfall and its
    (stage, status, n_docs) report — the merged status report a
    pipeline operator reads each morning. Benchmarked by bench.py as
    `pipelines.incremental_e2e` (outside the headline total, the
    dedup_e2e policy) on the NATURAL tables so the baseline series
    stays comparable round over round; the value-checked catalog key
    (queries_llm.llm_incremental_e2e_report) runs the same composition
    over a cross-stage planted fixture instead, so its driver row
    exercises every waterfall stage. Per-operator correctness is
    already oracle-pinned by the three llm_dedup_incremental* keys.
    `checkpoint` passes through to `incremental_e2e_classify` (False =
    one fully lazy plan, used by the plan gate)."""
    return incremental_e2e_report(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        checkpoint=checkpoint,
    )
