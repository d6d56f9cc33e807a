"""Engine configuration (replaces the reference's hardcoded literals and
``lambda/stock_extractor/config.py``).

Reference parity notes (citations into /root/reference):
- symbols: lambda/stock_extractor/config.py:21
- market-cap tier thresholds: glue/jobs/build_stock_dimensions.py:57-59
  (>1e12 Large, >1e10 Mid, else Small — note 1e10..1e12 is "Mid")
- sector/industry defaults: glue/jobs/build_stock_dimensions.py:60-61
  (hardcoded "Technology"/"Consumer Electronics" in the reference; here a
  config map so it is sourced, not baked into the transform)
- dim_date span: glue/jobs/build_stock_dimensions.py:112-114 (2020..2026)
- exchanges: glue/jobs/build_stock_dimensions.py:159-163
"""

from __future__ import annotations

SYMBOLS = ["AAPL", "MSFT", "GOOGL", "AMZN", "META"]

LARGE_CAP_THRESHOLD = 1_000_000_000_000  # > 1e12 -> Large Cap
MID_CAP_THRESHOLD = 10_000_000_000  # > 1e10 -> Mid Cap, else Small Cap

DEFAULT_SECTOR = "Technology"
DEFAULT_INDUSTRY = "Consumer Electronics"
SECTOR_MAP = {s: DEFAULT_SECTOR for s in SYMBOLS}

DIM_DATE_START = "2020-01-01"
DIM_DATE_END = "2026-12-31"

EXCHANGES = [
    (1, "NASDAQ", "NASDAQ Stock Market", "USA", "America/New_York"),
    (2, "NYSE", "New York Stock Exchange", "USA", "America/New_York"),
    (3, "AMEX", "NYSE American", "USA", "America/New_York"),
]

DECIMAL_PRICE = "decimal(18,4)"
