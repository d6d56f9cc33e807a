"""Scalar column helpers — the reference's derived metrics as reusable
column builders. All JVM-side built-ins (whole-stage codegen); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config


def market_cap_tier(cap: Column | str) -> Column:
    """CASE-WHEN bucketing (build_stock_dimensions.py:57-59).

    >1e12 Large Cap; >1e10 Mid Cap; else Small Cap (gap semantics kept).
    """
    c = F.col(cap) if isinstance(cap, str) else cap
    return (
        F.when(c > config.LARGE_CAP_THRESHOLD, "Large Cap")
        .when(c > config.MID_CAP_THRESHOLD, "Mid Cap")
        .otherwise("Small Cap")
    )


def daily_volatility(high: Column | str, low: Column | str) -> Column:
    """(high - low) / low * 100, decimal(18,4) (build_stock_fact_table.py:73)."""
    h = F.col(high) if isinstance(high, str) else high
    l = F.col(low) if isinstance(low, str) else low
    return ((h - l) / l * 100).cast(config.DECIMAL_PRICE)


def revenue(price: Column | str, discount: Column | str) -> Column:
    """extendedprice * (1 - discount) — per-row double math, cast to money."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return (p * (1 - d)).cast(config.DECIMAL_PRICE)


def pct_return(open_: Column, close: Column) -> Column:
    """((close - open) / open) * 100 in double (weekly/monthly return pct,
    build_stock_aggregations.py:96,160)."""
    return (close.cast("double") - open_.cast("double")) / open_.cast("double") * 100
