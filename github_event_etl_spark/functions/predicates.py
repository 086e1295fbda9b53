"""Row predicates from the reference, as reusable Column expressions.

The reference has TWO distinct bot filters (a semantic quirk we preserve
as two operators — SURVEY.md §2A quirks):

1. Ingest path (insert-events.js:42,49-52): a regex
   ``/(\\[bot\\]|-bot$)/`` on ``actor.login``, null login passes through
   only because the JS guard skips the check — our engine treats a null
   login as not-a-bot on this path to match.
2. Batch scoring path (update-contributor-scores.js:45-68): a 15-pattern
   lowercase substring/prefix/suffix heuristic; null login IS a bot
   (:46-48 returns true).

Everything below is pure built-in Column algebra — JVM-side, inside
whole-stage codegen; no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# insert-events.js:42 — const BOT_PATTERN = /(\[bot\]|-bot$)/
BOT_REGEX = r"(\[bot\]|-bot$)"


def is_bot_login_regex(login: Column) -> Column:
    """Ingest-path bot test (insert-events.js:49-52). Null login => false
    (JS short-circuits ``event.actor && event.actor.login``)."""
    return login.isNotNull() & login.rlike(BOT_REGEX)


# update-contributor-scores.js:52-66, lowercased substring tests in order.
_BOT_CONTAINS = (
    "[bot]",
    "-bot",
    "copilot",
    "renovate",
    "greenkeeper",
    "snyk",
    "security",
    "automation",
    "deploy",
    "ci-",
    "-ci",
    "build",
    "release",
)


def is_bot_login_heuristic(login: Column) -> Column:
    """Batch-path bot heuristic (update-contributor-scores.js:45-68).

    Null/empty login => bot (:46 — ``!login`` is true for '' in JS, so
    the empty string must test as bot too). Patterns: the substring
    list above plus ``endswith('bot')`` and ``startswith('aws')``
    (:53-55). Compound boolean expression — Catalyst folds it into one
    codegen'd predicate; no UDF.
    """
    low = F.lower(login)
    expr = low.endswith("bot") | low.startswith("aws")
    for pat in _BOT_CONTAINS:
        expr = expr | low.contains(pat)
    return login.isNull() | (login == F.lit("")) | expr


def is_scoring_event(event_type: Column, kinds: tuple[str, ...]) -> Column:
    """Event-type predicate (update-contributor-scores.js:124):
    ``type === 'PushEvent' || type === 'PullRequestEvent'`` generalized
    to an isin over the scoring kinds."""
    return event_type.isin(*kinds)
