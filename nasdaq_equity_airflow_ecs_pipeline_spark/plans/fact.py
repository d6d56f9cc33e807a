"""Fact builder (reference Glue job 2, glue/jobs/build_stock_fact_table.py).

W1 latest-wins dedup -> P1 typed 20-column projection -> P5 derived
volatility. Deterministic key = xxhash64(symbol, trade_date) (§4.3.2 fix
for monotonically_increasing_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import daily_volatility
from ..operators.dedup import latest_wins

DEC = "decimal(18,4)"


def build_fact_daily_price(quotes: DataFrame, processing_date: str) -> DataFrame:
    """One deduped, typed fact row per (symbol, trade_date)
    (build_stock_fact_table.py:39-76)."""
    deduped = latest_wins(
        quotes,
        ["symbol"],
        [F.desc("extraction_time"), F.desc("timestamp")],
    )
    trade_date = F.to_date(F.lit(processing_date))
    return deduped.select(
        F.xxhash64("symbol", F.lit(processing_date)).alias("fact_key"),
        F.col("symbol").alias("stock_symbol"),
        trade_date.alias("trade_date"),
        F.from_unixtime("timestamp").cast("timestamp").alias("trade_timestamp"),
        F.col("price").cast(DEC).alias("close_price"),
        F.col("open").cast(DEC).alias("open_price"),
        F.col("day_high").cast(DEC).alias("high_price"),
        F.col("day_low").cast(DEC).alias("low_price"),
        F.col("previous_close").cast(DEC).alias("previous_close"),
        F.col("volume").cast("bigint").alias("volume"),
        F.col("market_cap").cast("bigint").alias("market_cap"),
        F.col("change").cast(DEC).alias("price_change"),
        F.col("change_percent").cast(DEC).alias("change_percentage"),
        F.col("year_high").cast(DEC).alias("year_high_52w"),
        F.col("year_low").cast(DEC).alias("year_low_52w"),
        F.col("price_avg_50").cast(DEC).alias("price_avg_50d"),
        F.col("price_avg_200").cast(DEC).alias("price_avg_200d"),
        daily_volatility("day_high", "day_low").alias("daily_volatility"),
        F.lit(processing_date).alias("processing_date"),
        F.current_timestamp().alias("created_at"),
    )
