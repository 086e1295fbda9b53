"""Declared queries — B8: scalar-function suites (SURVEY.md §2 B8).

Each suite exercises one function family end-to-end with a DuckDB
oracle. Dialect care (SURVEY §7 hard-part 5): every computed column is
aliased identically in both engines; float-producing functions are
rounded to a fixed scale so an engine-local ulp cannot flip the
value-hash; timestamps are emitted as fixed-format strings.

All expressions here are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd; no Python UDFs anywhere in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._synth import synth_login, synth_login_sql
from .catalog import query


# ------------------------------------------------------------------ strings


@query(
    "fn_string_suite",
    oracle=f"""
    SELECT event_id,
           lower(login)  AS lo,
           upper(login)  AS up,
           trim('  ' || login || ' ') AS trimmed,
           substring(login, 1, 3) AS sub3,
           concat_ws('-', event_type, login) AS joined,
           regexp_extract(login, '([0-9]+)', 1) AS digits,
           regexp_replace(login, '[0-9]+', '#') AS masked,
           CAST(length(login) AS BIGINT) AS len,
           lpad(CAST(event_id % 24 AS VARCHAR), 2, '0') AS hh,
           CAST(contains(lower(login), 'bot') AS BOOLEAN) AS has_bot,
           CAST(starts_with(lower(login), 'aws') AS BOOLEAN) AS aws_pre,
           CAST(ends_with(lower(login), 'bot') AS BOOLEAN) AS bot_suf
    FROM (SELECT event_id, event_type, {synth_login_sql()} AS login
          FROM events) t
    """,
    tags=("functions", "partB"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 strings: lower/upper/trim/substring/concat_ws/regexp_extract/
    regexp_replace/length/lpad (≙ padStart,
    update-contributor-scores.js:15-16) and the contains/startswith/
    endswith trio the bot heuristic is built from (:52-66)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", synth_login().alias("login")
    )
    lo = F.lower("login")
    return ev.select(
        "event_id",
        lo.alias("lo"),
        F.upper("login").alias("up"),
        F.trim(F.concat(F.lit("  "), F.col("login"), F.lit(" "))).alias("trimmed"),
        F.substring("login", 1, 3).alias("sub3"),
        F.concat_ws("-", "event_type", "login").alias("joined"),
        F.regexp_extract("login", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("login", r"[0-9]+", "#").alias("masked"),
        F.length("login").cast("bigint").alias("len"),
        F.lpad((F.col("event_id") % 24).cast("string"), 2, "0").alias("hh"),
        lo.contains("bot").alias("has_bot"),
        lo.startswith("aws").alias("aws_pre"),
        lo.endswith("bot").alias("bot_suf"),
    )


@query(
    "fn_string_split",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           string_split(text, ' ')[1] AS first_tok,
           string_split(text, ' ')[-1] AS last_tok
    FROM documents
    """,
    tags=("functions", "partB"),
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 strings: split + element access over `documents.text`
    (whitespace tokenization — the base op for every text-analysis
    operator in queries_llm)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.getItem(0).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )


# ---------------------------------------------------------------- date/time


@query(
    "fn_datetime_suite",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS fmt,
           CAST(extract(year  FROM ts) AS BIGINT) AS y,
           CAST(extract(month FROM ts) AS BIGINT) AS mo,
           CAST(extract(day   FROM ts) AS BIGINT) AS d,
           CAST(extract(hour  FROM ts) AS BIGINT) AS h,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS trunc_hour,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
           strftime(CAST(ts AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS BIGINT)
             AS days_to_feb
    FROM events
    """,
    tags=("functions", "partB"),
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 date/time: date_format / year / month / day / hour /
    date_trunc / unix_timestamp (≙ getTime()/1000,
    update-contributor-scores.js:41) / date_add / datediff — the A16
    bucketing family generalized."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("fmt"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("mo"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.date_format(
            F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("trunc_hour"),
        F.unix_timestamp("ts").alias("unix_sec"),
        F.date_format(F.date_add(F.to_date("ts"), 7), "yyyy-MM-dd").alias("plus7"),
        F.datediff(F.lit("2024-02-01").cast("date"), F.to_date("ts"))
        .cast("bigint")
        .alias("days_to_feb"),
    )


# --------------------------------------------------------------------- math


@query(
    "fn_math_suite",
    oracle="""
    SELECT event_id,
           round(value, 2) AS r2,
           CAST(floor(value) AS BIGINT) AS fl,
           CAST(ceil(value)  AS BIGINT) AS ce,
           abs(value - 50.0) AS ab,
           CAST(user_id * user_id AS DOUBLE) AS sq,
           round(sqrt(CAST(user_id AS DOUBLE)), 6) AS sq_root,
           round(ln(CAST(user_id + 1 AS DOUBLE)), 6) AS log_nat,
           CAST(((event_id % 7) + 7) % 7 AS BIGINT) AS pm,
           CAST(sign(value - 50.0) AS DOUBLE) AS sg
    FROM events
    """,
    tags=("functions", "partB"),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 math: round/floor/ceil/abs/pow/sqrt/log/pmod/sign.
    Irrational-producing fns (sqrt, ln) are rounded to 6 decimals so a
    libm-vs-JVM last-ulp difference can't flip the hash; pow on integer
    args is expressed as exact multiplication."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.select(
        "event_id",
        F.round("value", 2).alias("r2"),
        F.floor("value").cast("bigint").alias("fl"),
        F.ceil("value").cast("bigint").alias("ce"),
        F.abs(F.col("value") - 50.0).alias("ab"),
        (u * u).alias("sq"),
        F.round(F.sqrt(u), 6).alias("sq_root"),
        F.round(F.log(u + 1.0), 6).alias("log_nat"),
        F.pmod(F.col("event_id"), F.lit(7)).cast("bigint").alias("pm"),
        F.signum(F.col("value") - 50.0).cast("double").alias("sg"),
    )


# -------------------------------------------------------------------- arrays


@query(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
           round(CAST(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'
           ) AS DOUBLE), 6) AS emax,
           CAST(list_contains(
             list_transform(embedding, x -> CAST(x AS DOUBLE) > 0.9), true
           ) AS BOOLEAN) AS any_gt09,
           round(CAST(list_sort(
             list_transform(embedding, x -> CAST(x AS DOUBLE))
           )[1] AS DOUBLE), 6) AS emin_sorted,
           CAST(len(embedding[1:8]) AS BIGINT) AS slice_len
    FROM embeddings
    """,
    tags=("functions", "partB"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 arrays: size/element/array_max/array_contains-family/
    sort_array/slice over embeddings.embedding (array<float>, 64 dims).
    Elements are cast to double and rounded on output — float32 bits
    are identical in both engines, so the cast is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("e0"),
        F.round(F.array_max(vecd), 6).alias("emax"),
        F.exists("embedding", lambda x: x.cast("double") > 0.9).alias("any_gt09"),
        F.round(F.array_sort(vecd).getItem(0), 6).alias("emin_sorted"),
        F.size(F.slice("embedding", 1, 8)).cast("bigint").alias("slice_len"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           CAST(unnest(range(len(string_split(text, ' ')))) AS INTEGER) AS pos
    FROM documents
    WHERE doc_id % 50 = 0
    """,
    tags=("functions", "partB"),
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 arrays: posexplode — one row per token with its position
    (the built-in UDTF family; basis for shingling in queries_llm).
    Restricted to every-50th doc to keep the oracle comparison small."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", "tok", F.col("pos").cast("int").alias("pos"))


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_reduce(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             (s, x) -> s + x
           ), 6) AS vec_sum,
           round(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (s, x) -> s + x
           ), 6) AS self_dot,
           CAST(len(list_filter(
             list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x > 0.5
           )) AS BIGINT) AS n_gt_half
    FROM embeddings
    """,
    tags=("functions", "partB", "higher-order"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 higher-order fns: aggregate (fold), zip_with, filter — the
    exact building blocks of the cosine-similarity operator (B11).
    Folds run left-to-right over identical element order in both
    engines, double-precision throughout, so the pre-round values are
    bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = F.transform("embedding", lambda x: x.cast("double"))
    vec_sum = F.aggregate(vecd, F.lit(0.0), lambda s, x: s + x)
    self_dot = F.aggregate(
        F.zip_with(vecd, vecd, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    return emb.select(
        "vec_id",
        F.round(vec_sum, 6).alias("vec_sum"),
        F.round(self_dot, 6).alias("self_dot"),
        F.size(F.filter(vecd, lambda x: x > 0.5)).cast("bigint").alias("n_gt_half"),
    )


# --------------------------------------------------------------- map/struct


@query(
    "fn_map_struct",
    oracle="""
    SELECT event_id,
           event_type AS s_type,
           CAST(user_id AS BIGINT) AS s_user,
           'event_type' AS k0,
           CAST(user_id AS VARCHAR) AS v_user
    FROM events
    """,
    tags=("functions", "partB"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 map/struct: named_struct + getField, create_map + map_keys/
    map_values. The struct/map is built and immediately consumed so the
    oracle only has to reproduce the scalar results (DuckDB's MAP
    rendering differs; the lookups are what's being checked)."""
    ev = load_table(spark, sf_dir, "events")
    st = F.named_struct(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id")
    )
    mp = F.create_map(
        F.lit("event_type"),
        F.col("event_type"),
        F.lit("user_id"),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        st.getField("type").alias("s_type"),
        st.getField("user").cast("bigint").alias("s_user"),
        F.map_keys(mp).getItem(0).alias("k0"),
        F.map_values(mp).getItem(1).alias("v_user"),
    )


# --------------------------------------------------------------------- JSON


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CAST(json_extract(props, '$.missing') IS NULL AS BOOLEAN) AS missing_null
    FROM events
    """,
    tags=("functions", "partB"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 JSON (≙ A8 inverse): schema-on-read over the `props` column
    (the reference's flattened payload, insert-events-into-db.lua:17-23).
    ONE from_json parse feeds every derived column — the parse is
    materialized as a struct column in its own projection and the
    derived columns read struct FIELDS, so the document parses exactly
    once per row. (Inlining the same from_json expression three times
    relies on codegen subexpression elimination, which Spark 4 does not
    apply across these branches — measured ~1.4× slower. Per-path
    get_json_object would re-parse per path: equal-or-worse.) Missing
    paths null-propagate through the struct schema."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT, missing STRING")
    return ev.select("event_id", parsed.alias("p")).select(
        "event_id",
        F.col("p.k").alias("k_num"),
        (F.col("p.k") * 2).alias("k_doubled"),
        F.col("p.missing").isNull().alias("missing_null"),
    )


@query(
    "fn_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS amount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    tags=("functions", "partB", "reshape"),
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 reshape: UNPIVOT/melt — the inverse of `agg_pivot_type`'s
    wide pivot, turning four measure columns into (metric, amount)
    rows. `DataFrame.unpivot` plans a single Expand over ONE scan
    (each input row emits 4 output rows in the same task — map-side,
    no shuffle, no self-union re-scan); the oracle's 4-way UNION ALL
    is the portable relational spelling of the same multiset. Stored
    doubles pass through unchanged (no arithmetic), so the value hash
    is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    )


# ------------------------------------------------------------------ URLs


@query(
    "fn_url_extract",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/' || lang || '/doc/'
               || CAST(doc_id AS VARCHAR) || '?ref=' || source AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param
    FROM u
    """,
    tags=("functions", "partB", "llm"),
)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 URL decomposition: host / path / query-parameter extraction
    with the JVM `parse_url` builtin. Domain-level operations are
    first-class in web-corpus curation — per-domain dedup, blocklist
    filtering and domain mixture weighting all start by splitting a
    URL into its components — and a regex in Python would be the slow
    path. The documents table carries no URL column, so the query
    derives a deterministic one from (source, lang, doc_id) and then
    decomposes it; the oracle mirrors the decomposition with anchored
    regexes (DuckDB has no parse_url), pinning that `parse_url`'s
    HOST/PATH/QUERY grammar agrees with the portable regex reading.

    Scale shape: pure map-side scalar expressions inside whole-stage
    codegen — no shuffle, no UDF; at 100 TB this runs at scan
    speed."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
    )
    return docs.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias(
            "ref_param"
        ),
    )
