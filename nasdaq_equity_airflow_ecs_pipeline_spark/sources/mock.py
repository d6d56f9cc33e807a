"""Synthetic quote feed (reference S6: mock generator,
lambda/stock_extractor/lambda_function.py:125-156).

The reference loops driver-side in Python; here ``spark.range`` + column
expressions generate any number of rows distributed, seeded for
reproducibility. Shape matches RAW_QUOTE_SCHEMA, and every symbol gets
``copies`` records with distinct extraction_time so latest-wins dedup is
observable (FIXTURES.md dedup requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config


def generate_mock_quotes(
    spark: SparkSession,
    trading_date: str,
    symbols: list[str] | None = None,
    copies: int = 2,
    seed: int = 42,
) -> DataFrame:
    symbols = symbols or config.SYMBOLS
    sym_arr = F.array(*[F.lit(s) for s in symbols])
    n = len(symbols) * copies
    df = spark.range(n).select(
        sym_arr[(F.col("id") % len(symbols)).cast("int")].alias("symbol"),
        F.col("id").alias("_i"),
    )

    def u(lo: float, hi: float, salt: int) -> F.Column:
        return F.round(F.lit(lo) + F.rand(seed + salt) * F.lit(hi - lo), 2)

    return df.select(
        "symbol",
        F.concat("symbol", F.lit(" Inc.")).alias("name"),
        F.lit("NASDAQ").alias("exchange"),
        u(100, 500, 1).alias("price"),
        u(100, 500, 2).alias("open"),
        u(100, 500, 3).alias("previous_close"),
        # unlike the reference's mock (lambda_function.py:138-141) the
        # low/high pair is ordered, so the quality gate's A>=B invariant
        # holds on generated data
        F.least(u(100, 500, 4), u(100, 500, 5)).alias("day_low"),
        F.greatest(u(100, 500, 4), u(100, 500, 5)).alias("day_high"),
        u(50, 200, 6).alias("year_low"),
        u(300, 600, 7).alias("year_high"),
        u(-10, 10, 8).alias("change"),
        u(-5, 5, 9).alias("change_percent"),
        (F.lit(500_000) + (F.rand(seed + 10) * 1_500_000).cast("long")).alias("volume"),
        (F.lit(1_000_000_000) + (F.rand(seed + 11) * 2_999e9).cast("long")).alias("market_cap"),
        u(100, 500, 12).alias("price_avg_50"),
        u(100, 500, 13).alias("price_avg_200"),
        F.unix_timestamp(F.to_timestamp(F.lit(trading_date))).alias("timestamp"),
        # distinct extraction_time per copy -> exercises latest-wins dedup
        F.date_format(
            F.to_timestamp(F.lit(trading_date)) + F.make_interval(secs=F.col("_i")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("extraction_time"),
        F.lit("mock").alias("api_endpoint"),
        F.lit(trading_date).alias("date"),
    )
