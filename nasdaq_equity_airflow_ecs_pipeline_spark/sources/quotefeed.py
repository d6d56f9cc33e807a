"""Custom Python DataSource for the quote feed (Spark 4 DataSource API).

The reference ingests quotes with a driver-external Lambda that loops
symbols at 1 rps and drops JSONL on S3 (`lambda/stock_extractor/
lambda_function.py:51-103,158-197`); `sources/http.py` reproduces that
driver-side. This module is the *engine-native* form: a registered
`spark.dataSource` whose partitions fetch on the EXECUTORS — symbol
chunks scan in parallel, each partition honoring its own rate budget, so
ingest scales with the cluster instead of a single loop.

    spark.dataSource.register(QuoteFeedDataSource)
    spark.read.format("quotefeed")
         .option("date", "2024-01-02").option("parallelism", "4").load()

Batch and streaming share the row generator: the stream reader exposes
one micro-batch per trading day via monotonic day offsets (initial ->
latest = days between ``start_date`` and ``end_date``), which is exactly
the reference's daily-cron cadence expressed as a Structured Streaming
source — `Trigger.AvailableNow` drains the backlog day by day with
checkpointed exactly-once offsets.

The default fetcher is deterministic synthetic data (seeded per
(symbol, date, field) by md5 — same idea as `sources/mock.py`, but pure
Python so it runs inside DataSource.read on executors; the container has
no network). A real deployment swaps `_fetch_quote` for the HTTP call —
partition shape, offsets, and schema stay identical.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .. import config
from ..schemas import RAW_QUOTE_SCHEMA

_FIELDS = [f.name for f in RAW_QUOTE_SCHEMA.fields]


def _t2(x: float) -> float:
    """Truncate to 2 decimals via floor — unlike Python's banker's
    round(), floor(x*100)/100 is bit-identical in every SQL engine, which
    is what keeps the generated feed inside the exact oracle gate
    (q_quotefeed)."""
    return math.floor(x * 100.0) / 100.0


def _u(symbol: str, day: str, field: str, lo: float, hi: float) -> float:
    """Deterministic uniform value in [lo, hi): md5-seeded by identity —
    the same quote is produced no matter which partition/executor/run
    generates it (idempotent re-reads, replayable streams). The DuckDB
    twin is ('0x' || substr(md5(...), 1, 16))::UBIGINT / 2^64 with the
    identical double arithmetic."""
    h = int.from_bytes(
        hashlib.md5(f"{symbol}|{day}|{field}".encode()).digest()[:8], "big"
    )
    return _t2(lo + (h / 2**64) * (hi - lo))


def _fetch_quote(symbol: str, day: str) -> tuple:
    """One flat quote record in RAW_QUOTE_SCHEMA field order (the
    injection point a real HTTP fetcher replaces)."""
    lo, hi = sorted((_u(symbol, day, "a", 100, 500), _u(symbol, day, "b", 100, 500)))
    price = _u(symbol, day, "price", lo, hi)
    epoch = int(
        (date.fromisoformat(day) - date(1970, 1, 1)).total_seconds()
    )
    return (
        symbol,
        f"{symbol} Inc.",
        "NASDAQ",
        price,
        _u(symbol, day, "open", lo, hi),
        _u(symbol, day, "prev", lo, hi),
        lo,
        hi,
        _u(symbol, day, "ylow", 50, lo),
        _u(symbol, day, "yhigh", hi, 600),
        _t2(price - _u(symbol, day, "prev", lo, hi)),
        _u(symbol, day, "chgpct", -5, 5),
        math.floor(_u(symbol, day, "volume", 500_000, 2_000_000)),
        math.floor(_u(symbol, day, "mcap", 1e9, 3e12)),
        _u(symbol, day, "avg50", lo, hi),
        _u(symbol, day, "avg200", lo, hi),
        epoch,
        f"{day}T02:00:00",
        "quotefeed",
    )


@dataclass
class SymbolChunk(InputPartition):
    symbols: tuple
    day: str


def _chunks(symbols: list[str], n: int) -> list[tuple]:
    n = max(1, min(n, len(symbols)))
    size = -(-len(symbols) // n)
    return [tuple(symbols[i : i + size]) for i in range(0, len(symbols), size)]


class QuoteFeedReader(DataSourceReader):
    def __init__(self, options):
        self.day = options.get("date", "2024-01-02")
        self.symbols = (
            options["symbols"].split(",") if "symbols" in options else config.SYMBOLS
        )
        self.parallelism = int(options.get("parallelism", "4"))

    def partitions(self):
        return [SymbolChunk(c, self.day) for c in _chunks(self.symbols, self.parallelism)]

    def read(self, partition):
        for s in partition.symbols:
            yield _fetch_quote(s, partition.day)


class QuoteFeedStreamReader(DataSourceStreamReader):
    """Day-granular feed: offsets are day ordinals relative to start_date
    and ``partitions()`` emits one split per (day, symbol-chunk), so
    every day is fetched in parallel. ``latestOffset`` exposes the whole
    remaining backlog, so a default or AvailableNow trigger drains ALL
    days in ONE micro-batch (of per-day splits) and then idles at the
    head. Per-day micro-batch throttling is deliberately NOT attempted:
    the Python DataSourceStreamReader never learns the checkpointed
    offset (a fresh reader's call-counting cursor would regress behind
    the checkpoint on restart — the engine compares offsets by equality
    only, yielding stuck or duplicate batches), and read-limit admission
    control is not exposed to Python sources."""

    def __init__(self, options):
        self.start = date.fromisoformat(options.get("start_date", "2024-01-02"))
        self.end = date.fromisoformat(options.get("end_date", "2024-01-04"))
        if self.end < self.start:
            raise ValueError(
                f"quotefeed: end_date {self.end} is before start_date "
                f"{self.start} (latestOffset would precede initialOffset, "
                f"which Spark rejects with an opaque error)"
            )
        self.symbols = (
            options["symbols"].split(",") if "symbols" in options else config.SYMBOLS
        )
        self.parallelism = int(options.get("parallelism", "4"))

    def initialOffset(self):
        return {"day": 0}

    def latestOffset(self):
        return {"day": (self.end - self.start).days + 1}

    def partitions(self, start, end):
        out = []
        for d in range(start["day"], end["day"]):
            day = (self.start + timedelta(days=d)).isoformat()
            out.extend(SymbolChunk(c, day) for c in _chunks(self.symbols, self.parallelism))
        return out

    def read(self, partition):
        for s in partition.symbols:
            yield _fetch_quote(s, partition.day)

    def commit(self, end):
        pass


class QuoteFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "quotefeed"

    def schema(self):
        return RAW_QUOTE_SCHEMA

    def reader(self, schema):
        return QuoteFeedReader(self.options)

    def streamReader(self, schema):
        return QuoteFeedStreamReader(self.options)
