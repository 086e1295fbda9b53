from .scoring import hourly_scores, daily_rollup, top_contributors
from .dedup import dedup_by_key
from .topk import top_k, top_k_per_group
from .retention import last_n_view

__all__ = [
    "hourly_scores",
    "daily_rollup",
    "top_contributors",
    "dedup_by_key",
    "top_k",
    "top_k_per_group",
    "last_n_view",
]
