"""Document deduplication operators (SURVEY.md §2 B11; north-star
LLM-pipeline mandate).

The reference's only dedup is an exact-id existence check with a TTL
(insert-events-into-db.lua:8-11,36-39 — re-expressed in
operators/dedup.py). A training-data pipeline needs *content* dedup:
exact text hashing, MinHash/LSH and SimHash near-dedup, and n-gram
Jaccard verification. Everything here is built from JVM-side column
expressions — no Python UDFs in any hot path — so the whole pipeline
stays inside whole-stage codegen and scales by partitioning alone.

Scale posture (100 TB):
- Exact dedup shuffles on a 256-bit content hash: uniformly distributed
  keys, no skew, partial aggregation map-side.
- MinHash signatures are computed map-side (per-row expressions only);
  the only shuffle is the band-bucket exchange, whose fan-out is
  n_docs × n_bands small rows. Candidate verification joins docs twice
  by doc_id (sort-merge on a unique key). The full-corpus cross join
  never appears in any plan.
- All hashes are md5 hex strings: deterministic, engine-portable (the
  DuckDB oracle computes the identical value), and uniform enough for
  MinHash order statistics. Numeric min over the 128-bit value equals
  lexicographic min over fixed-width lowercase hex, so `array_min`
  on strings implements the MinHash minimum exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- tokenization


def words(text: Column) -> Column:
    """Whitespace word tokens. `trim` first so leading/trailing blanks
    never produce empty tokens — keeps Spark's split() and the oracle's
    string_split_regex() in exact agreement."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Contiguous word k-grams, space-joined. Docs shorter than k words
    yield an empty array (sequence(1, n-k+1) is empty when n < k)."""
    w = words(text)
    n = F.size(w)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------------- exact dedup


def normalized_text_hash(text: Column) -> Column:
    """Content identity: sha2-256 of lowercase/trimmed text. 256-bit ⇒
    collision-free for practical corpus sizes; uniformly distributed ⇒
    skew-free shuffle key at any scale."""
    return F.sha2(F.lower(F.trim(text)), 256)


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact near-duplicate grouping: one representative (min doc_id)
    per normalized content hash, plus the duplicate count.

    groupBy on the hash → map-side partial agg, one skew-free shuffle.
    """
    return (
        docs.withColumn("content_hash", normalized_text_hash(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ------------------------------------------------------------- MinHash / LSH

# Deterministic MinHash: permutation j is the md5 hash family member
# keyed by the literal prefix "<j>|". min over shingles of a uniform
# 128-bit hash is the classic MinHash order statistic.


def minhash_signature(text: Column, num_hashes: int = 12, k: int = 3) -> Column:
    """Array of `num_hashes` MinHash values (md5 hex strings) over word
    k-gram shingles. Pure per-row expression — computed map-side."""
    sh = word_shingles(text, k)
    sigs = [
        F.array_min(F.transform(sh, lambda s, j=j: F.md5(F.concat(F.lit(f"{j}|"), s))))
        for j in range(num_hashes)
    ]
    return F.array(*sigs)


def lsh_band_buckets(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """Array of (band_id, bucket_hash) structs: the signature cut into
    bands, each band hashed to one bucket key. Docs sharing any band
    bucket are candidate near-duplicates."""
    bands = []
    for b in range(num_bands):
        lo = b * rows_per_band + 1  # slice() is 1-based
        band = F.slice(sig, lo, rows_per_band)
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", band)).alias("bucket"),
            )
        )
    return F.array(*bands)


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_bands: int = 4,
    rows_per_band: int = 3,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) via MinHash-LSH
    banding.

    Plan shape (the 100 TB path — NO cross join anywhere):
      map-side: signature + band buckets per doc (expressions only)
      explode bands → shuffle on (band, bucket)   [n_docs × n_bands rows]
      self-join within identical buckets → distinct pairs
    """
    sig = minhash_signature(F.col(text_col), num_bands * rows_per_band, k)
    buckets = (
        docs.select("doc_id", F.explode(lsh_band_buckets(sig, num_bands, rows_per_band)).alias("bb"))
        .select("doc_id", "bb.band", "bb.bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------- n-gram Jaccard


def jaccard_ngram(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact Jaccard similarity of the word k-gram *sets* of two texts,
    rounded to 6 decimals (a small-integer ratio — rounding is stable
    across engines). Used to verify LSH candidates."""
    sa = F.array_distinct(word_shingles(text_a, k))
    sb = F.array_distinct(word_shingles(text_b, k))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.round(
        F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )


def verify_pairs_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Join candidate pairs back to their texts and keep those with
    n-gram Jaccard ≥ threshold. Two equi-joins on the unique doc_id —
    sort-merge (or broadcast if the pair set is small; AQE decides)."""
    texts = docs.select(F.col("doc_id"), F.col(text_col).alias("_t"))
    return (
        pairs.join(texts.withColumnRenamed("_t", "_ta"), pairs.doc_a == texts.doc_id)
        .drop("doc_id")
        .join(
            texts.withColumnRenamed("_t", "_tb").withColumnRenamed("doc_id", "_idb"),
            F.col("doc_b") == F.col("_idb"),
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard_ngram(F.col("_ta"), F.col("_tb"), k).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------------- SimHash


# Bit weights 2^0..2^62, then Long.MIN_VALUE for bit 63 (two's complement).
_BIT_WEIGHTS = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens, using Spark's JVM-side
    xxhash64 per token (no Python in the loop).

    Per bit b: vote = Σ_tokens (+1 if bit set else −1); bit b of the
    fingerprint is 1 when the vote is positive. Near-identical documents
    land within a few bits of Hamming distance.

    Single pass over the token array: the fold accumulator is the
    64-wide vote vector (`aggregate` with an array accumulator), then
    the sign vector is folded into one long via per-bit weights. Pure
    map-side column expressions — scales with no shuffle.
    """
    hashes = F.transform(words(text), lambda t: F.xxhash64(t))
    weights = F.array(*[F.lit(w).cast("long") for w in _BIT_WEIGHTS])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                weights,
                lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            weights,
            lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, w: acc.bitwiseOR(w),
    )


def simhash_candidate_pairs(
    docs: DataFrame, text_col: str = "text", num_blocks: int = 4
) -> DataFrame:
    """Near-dup candidates by SimHash block matching: split the 64-bit
    fingerprint into `num_blocks` 16-bit blocks; pairs agreeing on any
    block (≤ num_blocks−1 differing blocks ⇒ Hamming ≤ 48 guaranteed
    caught; in practice catches Hamming ≤ 3 with 4 blocks) are
    candidates. Same explode→bucket-join shape as MinHash LSH: no cross
    join, shuffle is n_docs × num_blocks rows."""
    fp = simhash64(F.col(text_col))
    width = 64 // num_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.shiftrightunsigned(fp, b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for b in range(num_blocks)
        ]
    )
    keyed = docs.select("doc_id", F.explode(blocks).alias("kb")).select(
        "doc_id", "kb.block", "kb.val"
    )
    l, r = keyed.alias("l"), keyed.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.block") == F.col("r.block"),
                F.col("l.val") == F.col("r.val"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
