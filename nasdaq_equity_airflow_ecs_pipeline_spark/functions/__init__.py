from .scalar import market_cap_tier, daily_volatility, revenue, pct_return
from .stable import dsum, davg, dstddev, dround

__all__ = [
    "market_cap_tier", "daily_volatility", "revenue", "pct_return",
    "dsum", "davg", "dstddev", "dround",
]
