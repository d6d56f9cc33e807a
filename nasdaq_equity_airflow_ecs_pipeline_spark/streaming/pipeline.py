"""The daily DAG in streaming form: quotefeed stream -> streaming dedup
-> per-day star-schema landing (dims upsert, fact cow-MERGE, scoped agg
maintenance, GX gate) under one ``Trigger.AvailableNow`` job.

Reference shape: docker/dags/nasdaq_stock_pipeline_with_gx.py:312-319
runs extract -> dimensions -> fact -> aggregations -> validate once per
day.  Here the same task body (``plans.pipeline.land_quotes`` — shared
code, not a re-implementation) runs inside ``foreachBatch`` for every
trading day the micro-batch carries, with three streaming-native
guarantees the cron DAG lacks:

- **backlog catch-up**: an AvailableNow run drains every day between
  the checkpointed offset and the feed head — the "DAG was down for a
  week" recovery is the same code path as the nightly run;
- **exactly-once landing**: the checkpoint marks drained offsets, and a
  replayed batch re-MERGEs the same rows to the same result (keyed
  upsert idempotence), so restarts never double-land a day;
- **at-least-once tolerance**: re-delivered quotes are dropped by
  first-arrival-wins streaming dedup BEFORE transformation.

Raw archive parity (K1): each day's quotes are appended to the raw
JSONL ``date=`` layout before transformation, exactly like the batch
path, so backfills re-run from raw identically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import land_quotes
from ..sources.jsonl import read_quotes_jsonl, write_quotes_jsonl
from .dedup import dedup_stream

_TABLES = (
    "fact_stock_daily_price",
    "dim_stock",
    "dim_date",
    "dim_exchange",
    "agg_stock_weekly_metrics",
    "agg_stock_monthly_metrics",
    "agg_sector_performance",
)


def run_streaming_pipeline(
    spark: SparkSession,
    warehouse: str,
    start_date: str,
    end_date: str,
    checkpoint: str | None = None,
    validate: bool = True,
    symbols: str | None = None,
    max_days_per_batch: int | None = None,
) -> dict[str, str]:
    """Drain the quotefeed backlog [start_date, end_date] into the star
    schema under ``warehouse`` and return {table: path}.

    Restart-idempotent: a second call with the same checkpoint is a
    no-op (offsets are drained), and a crash mid-run replays the last
    batch into identical tables.  Output is identical to running
    ``plans.pipeline.run_pipeline(raw_root="quotefeed")`` once per day —
    both call the same ``land_quotes`` body on the same deterministic
    feed.

    Driver-memory bound: the per-batch day list is BOUNDED, not
    data-dependent — a micro-batch can only carry days inside the
    configured feed range, so the distinct-day collect is capped at
    ``max_days_per_batch`` (default: the range length, ~365 rows of
    10-char strings per backlog year — metadata-sized at any realistic
    backfill depth; a 30-year drain collects ~11k strings once). The cap
    is enforced with a ``limit(cap+1)`` on the collect itself, so even a
    misbehaving source cannot pull an unbounded list onto the driver —
    it fails the batch with an explicit message instead. True per-day
    micro-batch throttling is not expressible for Python stream readers
    (see ``sources/quotefeed.py QuoteFeedStreamReader`` docstring: the
    reader never learns the checkpointed offset, so a throttled
    ``latestOffset`` regresses on restart); the serial day loop itself
    is inherent — scoped aggregate maintenance must see days in
    calendar order."""
    from datetime import date

    from ..sources.quotefeed import QuoteFeedDataSource

    spark.dataSource.register(QuoteFeedDataSource)
    range_days = (
        date.fromisoformat(end_date) - date.fromisoformat(start_date)
    ).days + 1
    day_cap = max_days_per_batch if max_days_per_batch is not None else range_days
    os.makedirs(warehouse, exist_ok=True)
    paths = {t: os.path.join(warehouse, t) for t in _TABLES}
    raw_root = os.path.join(warehouse, "raw")
    checkpoint = checkpoint or os.path.join(warehouse, "_checkpoint")

    reader = (
        spark.readStream.format("quotefeed")
        .option("start_date", start_date)
        .option("end_date", end_date)
    )
    if symbols:
        reader = reader.option("symbols", symbols)
    stream = reader.load().withColumn(
        # extraction_time is "YYYY-MM-DDTHH:MM:SS" — a deterministic
        # string slice, immune to session-timezone epoch math
        "date",
        F.substring("extraction_time", 1, 10),
    )
    # at-least-once transport guard: first arrival wins per (symbol, day)
    deduped = dedup_stream(stream, ["symbol", "date"])

    def land_batch(batch, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        bs = batch.sparkSession
        # K1 parity: archive raw first; then land each day through the
        # SAME per-day body as the batch DAG, oldest day first so the
        # scoped aggregate maintenance sees days in calendar order
        write_quotes_jsonl(batch, raw_root)
        day_rows = (
            batch.select("date").distinct().limit(day_cap + 1).collect()
        )
        if len(day_rows) > day_cap:
            raise RuntimeError(
                f"streaming pipeline batch carries more than {day_cap} "
                f"distinct days — beyond the configured feed range "
                f"[{start_date}, {end_date}]. Split the backfill into "
                f"multiple runs or raise max_days_per_batch."
            )
        days = sorted(r["date"] for r in day_rows)
        for day in days:
            # dropDuplicates(symbol): a crash-replayed batch re-appends
            # its raw lines (at-least-once archive), but the tables stay
            # exactly-once because the day's quotes dedupe before the
            # keyed MERGE
            quotes = (
                read_quotes_jsonl(bs, raw_root, day)
                .drop("date")
                .dropDuplicates(["symbol"])
            )
            land_quotes(bs, quotes, day, paths, validate=validate)

    (
        deduped.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return paths
