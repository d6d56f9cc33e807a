from .dedup import latest_wins, exact_dedup
from .upsert import merge_upsert

__all__ = ["latest_wins", "exact_dedup", "merge_upsert"]
