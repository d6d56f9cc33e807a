from .dimensions import build_dim_stock
from .fact import build_fact_daily_price
from .aggregations import (
    build_weekly_metrics,
    build_monthly_metrics,
    build_sector_performance,
)
from .pipeline import run_pipeline

__all__ = [
    "build_dim_stock",
    "build_fact_daily_price",
    "build_weekly_metrics",
    "build_monthly_metrics",
    "build_sector_performance",
    "run_pipeline",
]
