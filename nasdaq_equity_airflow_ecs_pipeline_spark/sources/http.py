"""HTTP quote-feed connector (reference S5: the Lambda extractor,
lambda/stock_extractor/lambda_function.py:51-103; normalization P11
:63-96; rate limit :119-121, config.py:33).

Ingest-side fetching stays OUTSIDE Spark: a handful of per-symbol REST
calls is driver work (the reference runs it in a 512 MB Lambda), and
putting an HTTP client inside executors buys nothing but retry
complexity at this fan-in. The connector fetches, normalizes provider
camelCase to the engine's snake_case RAW_QUOTE_SCHEMA with the same
defaulting rules as the reference, and lands JSONL in ``date=``
partition dirs — from there the batch and streaming ingest paths take
over. For genuinely wide fan-out (thousands of endpoints), invert to
``mapInPandas`` over a symbol table instead.

No network in tests: ``fetch_fn`` injects the transport; the default is
urllib with a timeout, used only when explicitly called.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_QUOTE_SCHEMA

# provider camelCase -> engine snake_case (lambda_function.py:63-96 order)
FIELD_MAP = {
    "symbol": "symbol",
    "name": "name",
    "exchange": "exchange",
    "price": "price",
    "open": "open",
    "previousClose": "previous_close",
    "dayLow": "day_low",
    "dayHigh": "day_high",
    "yearLow": "year_low",
    "yearHigh": "year_high",
    "change": "change",
    "changesPercentage": "change_percent",
    "volume": "volume",
    "marketCap": "market_cap",
    "priceAvg50": "price_avg_50",
    "priceAvg200": "price_avg_200",
    "timestamp": "timestamp",
}
_FLOAT_FIELDS = {
    "price", "open", "previous_close", "day_low", "day_high", "year_low",
    "year_high", "change", "change_percent", "price_avg_50", "price_avg_200",
}
_INT_FIELDS = {"volume", "market_cap", "timestamp"}


def normalize_quote(
    raw: dict[str, Any], extraction_time: str, api_endpoint: str = "http"
) -> dict[str, Any]:
    """One provider record -> one RAW_QUOTE_SCHEMA row. Missing numeric
    fields default to 0 (reference ``quote.get(k, 0)`` semantics); types
    are coerced so a string-typed provider numeric can't poison the
    frame."""
    out: dict[str, Any] = {}
    for src, dst in FIELD_MAP.items():
        v = raw.get(src)
        if dst in _FLOAT_FIELDS:
            out[dst] = float(v) if v is not None else 0.0
        elif dst in _INT_FIELDS:
            out[dst] = int(float(v)) if v is not None else 0
        else:
            out[dst] = str(v) if v is not None else None
    out["extraction_time"] = extraction_time
    out["api_endpoint"] = api_endpoint
    return out


def default_fetch(url: str, timeout_s: float = 10.0) -> list[dict[str, Any]]:
    """stdlib transport; provider returns a JSON array of quote objects."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def fetch_quotes(
    symbols: Iterable[str],
    base_url: str,
    api_key: str,
    extraction_time: str,
    rate_limit_s: float = 1.0,
    fetch_fn: Callable[[str], list[dict[str, Any]]] = default_fetch,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> list[dict[str, Any]]:
    """Sequential per-symbol fetch with the reference's ~1 req/s budget
    (free-tier API). Errors on one symbol skip it, not the batch."""
    rows: list[dict[str, Any]] = []
    for i, sym in enumerate(symbols):
        if i > 0 and rate_limit_s > 0:
            sleep_fn(rate_limit_s)
        url = f"{base_url}/quote/{sym}?apikey={api_key}"
        try:
            payload = fetch_fn(url)
        except Exception:
            continue
        for raw in payload:
            rows.append(normalize_quote(raw, extraction_time, api_endpoint=url.split("?")[0]))
    return rows


def quotes_to_frame(spark: SparkSession, rows: list[dict[str, Any]]) -> DataFrame:
    """Typed frame ready for the JSONL landing write (sources.jsonl K1)."""
    return spark.createDataFrame(rows, schema=RAW_QUOTE_SCHEMA)
