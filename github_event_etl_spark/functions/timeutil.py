"""Time bucketing / partition-key derivation (reference A16).

The reference derives UTC ``YYYY-MM-DD`` date strings and integer hours
for its Redis key scheme (update-contributor-scores.js:12-25,
redis-key-generator.js:1-10) and a next-UTC-midnight expiry timestamp
(:33-42). Here those become typed expressions over event time.

Declared deviation (SURVEY.md §2A quirks): the reference attributes an
event to the *archive file's* hour; this engine buckets by *event time*
(date_trunc over ``created_at``) — strictly more correct, and the only
semantics that survive out-of-order arrival at scale.

All functions assume a UTC session timezone
(session.ensure_session_defaults) so outputs are host-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOUR_FMT = "yyyy-MM-dd HH"
DAY_FMT = "yyyy-MM-dd"
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def hour_bucket(ts: Column) -> Column:
    """UTC hour partition key as a fixed-width string 'yyyy-MM-dd HH'.

    String (not timestamp) on purpose: it is a *partition key* — the
    engine's analog of the reference's `{date}:{hour}` Redis key — and
    strings hash/compare identically everywhere. Zero-padded hour fixes
    the reference's unpadded-hour key drift (SURVEY.md §2A quirks).
    """
    return F.date_format(ts, HOUR_FMT)


def day_bucket(ts: Column) -> Column:
    """UTC date partition key 'yyyy-MM-dd' (update-contributor-scores.js:12-18)."""
    return F.date_format(ts, DAY_FMT)


def ts_string(ts: Column) -> Column:
    """Full-precision fixed-width timestamp string (microseconds).

    Used when a declared query must emit a timestamp: fixed format avoids
    engine-specific trailing-zero trimming in the oracle value-hash.
    """
    return F.date_format(ts, TS_FMT)


def next_utc_midnight(ts: Column) -> Column:
    """Next UTC midnight strictly after ts's day — the reference's
    EXPIREAT retention horizon (update-contributor-scores.js:33-42)."""
    return F.date_trunc("day", ts) + F.expr("INTERVAL 1 DAY")
