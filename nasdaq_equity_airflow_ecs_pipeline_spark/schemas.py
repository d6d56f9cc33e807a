"""Explicit schemas.

The reference infers the raw JSONL schema (``spark.read.json`` with no
schema, glue/jobs/build_stock_fact_table.py:32) — non-deterministic and a
full extra pass at scale. We declare it (FIXTURES.md §1) so the scan is
single-pass and the plan is stable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw quote feed — one flat JSON object per line
# (lambda/stock_extractor/lambda_function.py:63-96, mock :125-156).
RAW_QUOTE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("exchange", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("previous_close", T.DoubleType(), True),
        T.StructField("day_low", T.DoubleType(), True),
        T.StructField("day_high", T.DoubleType(), True),
        T.StructField("year_low", T.DoubleType(), True),
        T.StructField("year_high", T.DoubleType(), True),
        T.StructField("change", T.DoubleType(), True),
        T.StructField("change_percent", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("market_cap", T.LongType(), True),
        T.StructField("price_avg_50", T.DoubleType(), True),
        T.StructField("price_avg_200", T.DoubleType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("extraction_time", T.StringType(), True),
        T.StructField("api_endpoint", T.StringType(), True),
    ]
)

DEC = T.DecimalType(18, 4)

# fact_stock_daily_price — glue/jobs/build_stock_fact_table.py:55-76
FACT_COLUMNS = [
    "fact_key", "stock_symbol", "trade_date", "trade_timestamp",
    "close_price", "open_price", "high_price", "low_price", "previous_close",
    "volume", "market_cap", "price_change", "change_percentage",
    "year_high_52w", "year_low_52w", "price_avg_50d", "price_avg_200d",
    "daily_volatility", "processing_date", "created_at",
]

# dim_stock — glue/jobs/build_stock_dimensions.py:52-65
DIM_STOCK_COLUMNS = [
    "stock_key", "symbol", "company_name", "exchange", "market_cap_tier",
    "sector", "industry", "first_seen_date", "last_seen_date", "is_active",
]

# dim_date — glue/jobs/build_stock_dimensions.py:130-139
DIM_DATE_COLUMNS = [
    "date_key", "date", "year", "quarter", "month", "week",
    "day_of_week", "is_trading_day",
]

# agg tables — glue/jobs/build_stock_aggregations.py:80-97,142-161,206-217
AGG_WEEKLY_COLUMNS = [
    "year", "week", "symbol", "company_name", "week_open", "week_close",
    "week_high", "week_low", "total_volume", "avg_price", "price_std_dev",
    "avg_volatility", "weekly_return_pct",
]
AGG_MONTHLY_COLUMNS = [
    "year", "month", "symbol", "company_name", "sector", "month_open",
    "month_close", "month_high", "month_low", "total_volume", "avg_price",
    "avg_market_cap", "price_volatility", "monthly_return_pct",
    "avg_daily_volatility",
]
AGG_SECTOR_COLUMNS = [
    "date", "sector", "avg_sector_change_pct", "total_sector_volume",
    "avg_sector_market_cap", "num_stocks", "sector_volatility",
]
