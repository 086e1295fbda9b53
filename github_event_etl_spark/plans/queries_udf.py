"""Declared queries — B10: the Python UDF / UDAF / UDTF surface.

One query per user-defined-function shape (SURVEY.md §2 B10), each with
a full DuckDB oracle: the functions compute exact integer results (see
``functions/python_surface.py``), so even the Python-side paths are
value-hash-checked, not rows-only.

These are deliberately the ONLY declared queries that cross the
Python↔JVM boundary per row/batch; everything else in the catalog stays
in whole-stage codegen. The plan-shape tests (tests/test_plans.py)
assert Arrow evaluation (ArrowEvalPython / FlatMapGroupsInPandas) so a
silent fallback to pickled row-UDF execution fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.python_surface import (
    TOPK_PER_GROUP_SCHEMA,
    LeadingTokens,
    count_agg,
    head_token_upper_vec,
    sum_squares_agg,
    token_count_vec,
    topk_chars_per_lang,
)
from ..sources.tables import load_table
from .catalog import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           upper(string_split(text, ' ')[1]) AS head_token
    FROM documents
    """,
    tags=("udf", "partB"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 scalar UDFs: Arrow-vectorized ``@pandas_udf`` columns only —
    one Arrow batch per ~10k rows, never one Python call per row. The
    row-at-a-time ``F.udf`` contrast lives in tests/test_plans.py
    (equivalence + plan-shape contrast), keeping the declared query's
    plan pure ArrowEvalPython."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_vec("text").alias("n_tokens"),
        head_token_upper_vec("text").alias("head_token"),
    )


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars * n_chars) AS BIGINT) AS ss_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("udf", "partB"),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 grouped-agg pandas UDF (UDAF): exact ``SUM(v*v)`` per group.
    Spark shuffles on the group key and hands each group to the UDAFs
    as one Arrow batch. Both aggregates are pandas UDAFs because Spark
    forbids mixing group-agg pandas UDFs with builtin aggregates in one
    ``agg()`` ([INVALID_PANDAS_UDF_PLACEMENT])."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        count_agg("n_chars").alias("n_docs"),
        sum_squares_agg("n_chars").alias("ss_chars"),
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rnk,
               n_chars - min(n_chars) OVER (PARTITION BY lang) AS chars_vs_min
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(chars_vs_min AS BIGINT) AS chars_vs_min
    FROM ranked WHERE rnk <= 3
    """,
    tags=("udf", "partB"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 ``applyInPandas``: per-group top-k with a full-group floor
    delta, one shuffle on the group key, one Arrow batch per group.
    Deterministic tie-break (n_chars DESC, doc_id ASC) keeps the oracle
    hash stable. Groups must fit one executor's Arrow batch — true for
    a bounded key domain like ``lang``; an unbounded key would use the
    builtin window path (B5) instead."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        topk_chars_per_lang, schema=TOPK_PER_GROUP_SCHEMA
    )


@query(
    "udtf_leading_tokens",
    oracle="""
    SELECT d.doc_id,
           r.range - 1 AS pos,
           string_split(d.text, ' ')[CAST(r.range AS INT)] AS token
    FROM documents d, range(1, 4) r
    WHERE len(string_split(d.text, ' ')) >= r.range
    """,
    tags=("udf", "partB"),
)
def udtf_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 Python UDTF, lateral-joined: one input row fans out to up to
    three (pos, token) rows. The user-defined analog of the builtin
    ``posexplode(split(..))`` fast path (``fn_explode``); the UDTF form
    exists for fan-outs no builtin expresses."""
    spark.udtf.register("geetl_leading_tokens", LeadingTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "geetl_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM geetl_udtf_docs d, LATERAL geetl_leading_tokens(d.text) t
        """
    )
