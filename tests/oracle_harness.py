"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each declared Spark query and its oracle SQL
side-by-side and compares row count + schema + order-insensitive
value-hash (columns sorted by name). This harness reproduces that check
so every query is validated before a round ends. Comparison here is
strict: sorted columns, sorted rows, exact value equality (floats exact
— if two engines disagree in the last ulp the query must be rewritten
to be deterministic, not the test loosened).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb

from github_event_etl_spark.sources.tables import TABLE_NAMES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    # the Spark side's collected Rows (None for a failed-before-collect
    # compare) — exposed so differential tests that need the same
    # frame's contents (e.g. the cap-mirror tests) reuse ONE execution
    # instead of re-running the whole LSH pipeline per assertion
    spark_result: list | None = None


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [cols[i] for i in order], out


def compare_query(spark, con, name: str, fn, oracle: str | None,
                  sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    collected = sdf.collect()
    spark_rows = [tuple(r) for r in collected]
    if oracle is None:
        return CompareResult(
            name, True, f"rows-only: {len(spark_rows)} rows", collected
        )

    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        return CompareResult(
            name, False,
            f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}",
            collected,
        )
    if len(spark_rows) != len(duck_rows):
        return CompareResult(
            name, False,
            f"rowcount mismatch: spark={len(spark_rows)} duck={len(duck_rows)}",
            collected,
        )
    _, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:3]
        return CompareResult(
            name, False, f"value mismatch, first diffs: {diffs}", collected
        )
    return CompareResult(name, True, f"{len(spark_rows)} rows match", collected)
