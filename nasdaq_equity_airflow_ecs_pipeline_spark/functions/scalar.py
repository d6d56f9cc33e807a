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


def epoch_us(ts: Column | str) -> Column:
    """Microseconds since 1970-01-01 for a TIMESTAMP_NTZ column,
    timezone-independent.

    ``unix_micros``/``unix_timestamp`` require (or implicitly convert
    through) the session-local TIMESTAMP type, making results depend on
    ``spark.sql.session.timeZone`` — a driver-supplied session may run in
    any zone, and a DST transition inside the data range would even warp
    *differences*. ``timestamp_diff`` on two NTZ operands is pure wall-clock
    integer arithmetic, identical on every session and engine."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_diff(
        "MICROSECOND", F.expr("TIMESTAMP_NTZ'1970-01-01 00:00:00'"), c
    )


def epoch_sec(ts: Column | str) -> Column:
    """Whole seconds since epoch (floor) for TIMESTAMP_NTZ, TZ-independent."""
    return F.floor(epoch_us(ts) / F.lit(1_000_000)).cast("long")
