"""Python UDF / UDAF / UDTF surface (SURVEY.md §2 B10).

The engine's hot paths are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen). This module is the declared *extension surface*
for when a builtin genuinely does not exist — each of the four shapes
Spark offers, in its Arrow-vectorized form wherever one exists:

- scalar **pandas UDF** (``@pandas_udf``): Arrow batches, ~10-100x a
  row-at-a-time Python UDF;
- scalar **row UDF** (``F.udf``): kept only as the documented slow-path
  contrast — never used elsewhere in the engine;
- grouped-aggregate **pandas UDF** (UDAF): one Arrow batch per group,
  returns a scalar — Spark plans a full shuffle-on-key hash aggregate
  around it;
- **applyInPandas** (per-group table transform) and a Python **UDTF**
  (row → rows table function, lateral-joinable).

Determinism discipline (FIXTURES.md oracle rules): every function here
computes exact integer results, so the DuckDB value-hash cannot be
tripped by float associativity across engines — numpy reduces in a
different order than DuckDB's aggregator.

Reference parity: the reference's only "custom function" surface is the
inline JS bot heuristic (update-contributor-scores.js:45-68) and the
Lua flattener (insert-events-into-db.lua:17-23); both landed as builtin
expression chains (B2/A8). This module is capability closure mandated
by the north star, not a port.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql import types as T


# --------------------------------------------------------- scalar UDFs


# DataType instances, not DDL strings: workers re-import this module to
# unpickle the functions, and parsing a DDL string needs a live
# SparkContext the worker doesn't have.
@pandas_udf(T.LongType())
def token_count_vec(text: pd.Series) -> pd.Series:
    """Whitespace token count, Arrow-vectorized.

    Matches ``len(string_split(text, ' '))`` exactly, including empty
    tokens from consecutive spaces: a string with n single-space
    delimiters splits into n+1 pieces in both engines. NULL text stays
    NULL (SQL null propagation) — a nullable Int64 series, not a
    fillna-to-0, so the value-hash agrees with the oracle even when the
    corpus carries NULL rows.
    """
    return (text.str.count(" ") + 1).astype("Int64")


@pandas_udf(T.StringType())
def head_token_upper_vec(text: pd.Series) -> pd.Series:
    """First whitespace token, uppercased — Arrow-vectorized. NULL in,
    NULL out. Matches ``upper(string_split(text, ' ')[1])``.

    ``split(n=1)`` stops at the first delimiter — only the head token
    and one remainder string are materialized per row, ~2.4× faster
    than a full tokenization whose tail is immediately discarded."""
    return text.str.split(" ", n=1).str[0].str.upper()


@F.udf(returnType=T.StringType())
def first_token_upper_row(text):
    """Row-at-a-time slow-path contrast (see module docstring). Used
    ONLY by tests (tests/test_plans.py equivalence + plan contrast) —
    never in a declared query, so no hot path pays the per-row
    Python-call tax."""
    if text is None:
        return None
    return text.split(" ")[0].upper()


# ------------------------------------------------- grouped-agg (UDAF)


@pandas_udf(T.LongType())
def count_agg(v: pd.Series) -> int:
    """Grouped-aggregate count. Exists because Spark forbids mixing a
    group-agg pandas UDF with non-pandas aggregates in one ``agg()``
    ([INVALID_PANDAS_UDF_PLACEMENT]) — so the companion count must be a
    pandas aggregate as well.
    """
    return int(len(v))


@pandas_udf(T.LongType())
def sum_squares_agg(v: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact int64 sum of squares.

    Spark wraps this in a shuffle-on-key aggregate; within a group the
    whole column arrives as one Arrow batch. Integer math keeps the
    result bit-identical to any SQL engine's ``SUM(v*v)``.
    """
    a = v.to_numpy(dtype="int64")
    return int((a * a).sum())


# ------------------------------------- applyInPandas per-group transform

TOPK_PER_GROUP_SCHEMA = (
    "doc_id bigint, lang string, n_chars bigint, rnk bigint, chars_vs_min bigint"
)


TOPK_PER_GROUP_K = 3


def topk_chars_per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group transform: rank by (n_chars DESC, doc_id ASC), keep
    top-k, and carry ``n_chars - min(n_chars)`` computed over the FULL
    group (before truncation) — the part a plain window + limit cannot
    express in one pass without a second window.

    Single-argument signature on purpose: ``applyInPandas`` inspects
    arity, and a second parameter (even defaulted) selects the
    ``(key, pdf)`` calling convention.
    """
    k = TOPK_PER_GROUP_K
    floor = int(pdf["n_chars"].min())
    out = pdf.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = out.assign(
        rnk=range(1, len(out) + 1),
        chars_vs_min=out["n_chars"].astype("int64") - floor,
    )
    return out[["doc_id", "lang", "n_chars", "rnk", "chars_vs_min"]]


# ----------------------------------------------------------------- UDTF


@udtf(returnType="pos: bigint, token: string")
class LeadingTokens:
    """Python UDTF: emit the first three whitespace tokens of a string
    as (pos, token) rows. Lateral-joined against the owning table, it is
    the user-defined analog of the builtin ``posexplode(split(...))``
    (which remains the engine's fast path — B8 ``fn_explode``).
    """

    def eval(self, text):  # noqa: D102 — contract fixed by Spark
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")[:3]):
            yield i, tok
