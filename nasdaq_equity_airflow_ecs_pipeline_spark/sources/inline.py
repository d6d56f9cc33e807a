"""Inline/generated dimension sources (reference S3/S4).

The reference builds dim_date driver-side with a 2557-iteration Python loop
(glue/jobs/build_stock_dimensions.py:112-141). Here it is a single Catalyst
expression — ``sequence``/``explode`` — that runs distributed, costs no
driver memory, and scales to any span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config


def build_dim_date_frame(
    spark: SparkSession,
    start: str = config.DIM_DATE_START,
    end: str = config.DIM_DATE_END,
) -> DataFrame:
    """Calendar dimension: one row per day in [start, end].

    Columns match glue/jobs/build_stock_dimensions.py:116-139:
    date_key yyyymmdd int, date, year, quarter, month, ISO week,
    day name, is_trading_day (Mon-Fri).
    """
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS date"
    )
    return days.select(
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
        F.col("date"),
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        F.month("date").alias("month"),
        F.weekofyear("date").alias("week"),  # ISO week, matches Python isocalendar()
        F.date_format("date", "EEEE").alias("day_of_week"),
        (F.weekday("date") < F.lit(5)).alias("is_trading_day"),
    )


def build_dim_exchange_frame(spark: SparkSession) -> DataFrame:
    """Static 3-row exchange dimension (build_stock_dimensions.py:159-163)."""
    return spark.createDataFrame(
        config.EXCHANGES,
        ["exchange_key", "exchange_code", "exchange_name", "country", "timezone"],
    )
