from .predicates import is_bot_login_regex, is_bot_login_heuristic, is_scoring_event
from .timeutil import hour_bucket, day_bucket, ts_string, next_utc_midnight

__all__ = [
    "is_bot_login_regex",
    "is_bot_login_heuristic",
    "is_scoring_event",
    "hour_bucket",
    "day_bucket",
    "ts_string",
    "next_utc_midnight",
]
