"""Aggregate builders (reference Glue job 3,
glue/jobs/build_stock_aggregations.py).

J1/J2 star joins (dims broadcast — dim_date is 2557 rows, dim_stock is
one row per symbol) feeding A1/A2/A3 rollups. The reference's
``first(open)/last(close)`` are order-nondeterministic
(build_stock_aggregations.py:88-89); here open/close are min/max over a
(trade_date, symbol) struct sort key — deterministic and a single hash
aggregate (SURVEY §4.3.1).

Scale notes: the only shuffle per rollup is the groupBy on its keys;
weekly/monthly keys are (year, period, symbol) — high cardinality, evenly
distributed, so no skew; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stable import davg, dstddev, dsum

DEC = "decimal(18,4)"


def _with_dates(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """J1: attach calendar attributes via broadcast join
    (build_stock_aggregations.py:75-76)."""
    d = dim_date.select(
        F.col("date").alias("_d"), "year", "week", "month", "quarter"
    )
    return fact.join(F.broadcast(d), fact.trade_date == F.col("_d"), "left").drop("_d")


def _with_stock(fact: DataFrame, dim_stock: DataFrame) -> DataFrame:
    """J2: attach company/sector attributes (build_stock_aggregations.py:77)."""
    s = dim_stock.select(
        F.col("symbol").alias("_s"), "company_name", "sector"
    )
    return fact.join(
        F.broadcast(s), fact.stock_symbol == F.col("_s"), "left"
    ).drop("_s")


def _ohlc_aggs(open_col: str, close_col: str) -> dict:
    # (stock_symbol, trade_date) is the fact's unique key and symbol is a
    # group key in every rollup, so trade_date alone totally orders each
    # group — min_by/max_by on the scalar day number beats struct min/max
    days = F.datediff("trade_date", F.lit("1970-01-01"))
    return {
        "open": F.min_by(F.col(open_col), days),
        "close": F.max_by(F.col(close_col), days),
    }


def build_weekly_metrics(
    fact: DataFrame, dim_date: DataFrame, dim_stock: DataFrame
) -> DataFrame:
    """A1: per-(year, week, symbol) OHLCV
    (build_stock_aggregations.py:80-97)."""
    df = _with_stock(_with_dates(fact, dim_date), dim_stock)
    oc = _ohlc_aggs("open_price", "close_price")
    out = df.groupBy("year", "week", "stock_symbol").agg(
        F.first("company_name", ignorenulls=True).alias("company_name"),
        oc["open"].cast(DEC).alias("week_open"),
        oc["close"].cast(DEC).alias("week_close"),
        F.max("high_price").cast(DEC).alias("week_high"),
        F.min("low_price").cast(DEC).alias("week_low"),
        F.sum("volume").alias("total_volume"),
        davg("close_price").alias("avg_price"),
        dstddev("close_price").alias("price_std_dev"),
        davg("daily_volatility").alias("avg_volatility"),
        (
            (oc["close"].cast("double") - oc["open"].cast("double"))
            / oc["open"].cast("double")
            * 100
        ).alias("weekly_return_pct"),
    )
    return out.withColumnRenamed("stock_symbol", "symbol").select(
        "year", "week", "symbol", "company_name", "week_open", "week_close",
        "week_high", "week_low", "total_volume", "avg_price", "price_std_dev",
        "avg_volatility", "weekly_return_pct",
    )


def build_monthly_metrics(
    fact: DataFrame, dim_date: DataFrame, dim_stock: DataFrame
) -> DataFrame:
    """A2: per-(year, month, symbol) OHLCV + market cap
    (build_stock_aggregations.py:142-161)."""
    df = _with_stock(_with_dates(fact, dim_date), dim_stock)
    oc = _ohlc_aggs("open_price", "close_price")
    out = df.groupBy("year", "month", "stock_symbol").agg(
        F.first("company_name", ignorenulls=True).alias("company_name"),
        F.first("sector", ignorenulls=True).alias("sector"),
        oc["open"].cast(DEC).alias("month_open"),
        oc["close"].cast(DEC).alias("month_close"),
        F.max("high_price").cast(DEC).alias("month_high"),
        F.min("low_price").cast(DEC).alias("month_low"),
        F.sum("volume").alias("total_volume"),
        davg("close_price").alias("avg_price"),
        davg("market_cap").alias("avg_market_cap"),
        dstddev("close_price").alias("price_volatility"),
        (
            (oc["close"].cast("double") - oc["open"].cast("double"))
            / oc["open"].cast("double")
            * 100
        ).alias("monthly_return_pct"),
        davg("daily_volatility").alias("avg_daily_volatility"),
    )
    return out.withColumnRenamed("stock_symbol", "symbol").select(
        "year", "month", "symbol", "company_name", "sector", "month_open",
        "month_close", "month_high", "month_low", "total_volume", "avg_price",
        "avg_market_cap", "price_volatility", "monthly_return_pct",
        "avg_daily_volatility",
    )


def build_sector_performance(fact: DataFrame, dim_stock: DataFrame) -> DataFrame:
    """A3: per-(date, sector) daily rollup
    (build_stock_aggregations.py:206-217)."""
    df = _with_stock(fact, dim_stock)
    return df.groupBy(
        F.col("trade_date").alias("date"), "sector"
    ).agg(
        davg("change_percentage").alias("avg_sector_change_pct"),
        F.sum("volume").alias("total_sector_volume"),
        davg("market_cap").alias("avg_sector_market_cap"),
        F.count(F.lit(1)).alias("num_stocks"),
        dstddev("change_percentage").alias("sector_volatility"),
    )
