"""Deterministic synthesized columns shared by declared queries and
their DuckDB oracles.

The test `events` table carries numeric `user_id` (FIXTURES.md); the
reference's bot predicates operate on actor *login strings*
(insert-events.js:42, update-contributor-scores.js:45-68). To exercise
them, both the Spark query and the oracle derive the same deterministic
login from user_id. The pattern table covers every predicate branch:
regex-only matches, heuristic-only matches, both, and humans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (prefix, suffix) by user_id % 12 — which predicates fire:
#   deploy..[bot]  -> regex + heuristic ([bot])
#   mike..-bot     -> regex (-bot$) + heuristic (-bot)
#   x..bot         -> heuristic only (endswith 'bot')
#   aws..          -> heuristic only (startswith 'aws')
#   copilot.., renovate.., ci-.., release..  -> heuristic substring hits
#   alice.., bob.., carol.., dave..          -> humans
_LOGIN_PATTERNS = [
    ("alice", ""),
    ("deploy", "[bot]"),
    ("mike", "-bot"),
    ("x", "bot"),
    ("aws", ""),
    ("copilot", ""),
    ("renovate", ""),
    ("bob", ""),
    ("ci-", ""),
    ("carol", ""),
    ("release", ""),
    ("dave", ""),
]


def synth_login() -> Column:
    """Spark column: deterministic login derived from user_id."""
    u = F.col("user_id")
    expr = None
    for i, (pre, suf) in enumerate(_LOGIN_PATTERNS):
        login = F.concat(F.lit(pre), u.cast("string"), F.lit(suf))
        cond = (u % 12) == i
        expr = F.when(cond, login) if expr is None else expr.when(cond, login)
    return expr


def synth_login_sql(col: str = "user_id") -> str:
    """Same derivation in ANSI SQL for the DuckDB oracle."""
    whens = "\n".join(
        f"WHEN {i} THEN '{pre}' || CAST({col} AS VARCHAR) || '{suf}'"
        for i, (pre, suf) in enumerate(_LOGIN_PATTERNS)
    )
    return f"(CASE {col} % 12 {whens} END)"


def bot_heuristic_sql(login_sql: str) -> str:
    """The reference's 15-pattern bot heuristic
    (update-contributor-scores.js:45-68) in ANSI SQL, kept in sync with
    functions.predicates.is_bot_login_heuristic."""
    from ..functions.predicates import _BOT_CONTAINS

    low = f"lower({login_sql})"
    likes = [f"{low} LIKE '%bot'", f"{low} LIKE 'aws%'"]
    likes += [f"{low} LIKE '%{pat}%'" for pat in _BOT_CONTAINS]
    return (
        "("
        + f"({login_sql}) IS NULL OR ({login_sql}) = '' OR "
        + " OR ".join(likes)
        + ")"
    )


BOT_REGEX_SQL = r"'(\[bot\]|-bot$)'"
