"""Dimension builders (reference Glue job 1,
glue/jobs/build_stock_dimensions.py).

Differences from the reference, by design (SURVEY.md §4.3):
- deterministic surrogate keys (xxhash64 of the natural key) instead of
  ``monotonically_increasing_id`` — stable across runs and partitionings;
- latest-wins dedup (total order) instead of ``dropDuplicates(["symbol"])``
  whose survivor is arbitrary;
- sector/industry come from config, not hardcoded literals.

dim_date / dim_exchange live in sources.inline (they are generated, not
derived from data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from ..functions.scalar import market_cap_tier
from ..operators.dedup import latest_wins


def build_dim_stock(quotes: DataFrame, processing_date: str) -> DataFrame:
    """dim_stock from one day's raw quotes
    (build_stock_dimensions.py:52-65)."""
    latest = latest_wins(
        quotes,
        ["symbol"],
        [F.desc("extraction_time"), F.desc("timestamp")],
    )
    sector_map = F.create_map(
        *[F.lit(x) for kv in config.SECTOR_MAP.items() for x in kv]
    )
    return latest.select(
        F.xxhash64("symbol").alias("stock_key"),
        F.col("symbol"),
        F.col("name").alias("company_name"),
        F.col("exchange"),
        market_cap_tier("market_cap").alias("market_cap_tier"),
        F.coalesce(sector_map[F.col("symbol")], F.lit(config.DEFAULT_SECTOR)).alias(
            "sector"
        ),
        F.lit(config.DEFAULT_INDUSTRY).alias("industry"),
        F.lit(processing_date).alias("first_seen_date"),
        F.lit(processing_date).alias("last_seen_date"),
        F.lit(True).alias("is_active"),
    )
