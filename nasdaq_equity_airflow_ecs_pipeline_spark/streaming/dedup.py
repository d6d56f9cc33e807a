"""Streaming deduplication — the ingest-time guard an LLM training-data
pipeline puts in front of every document/event feed (exactly-once-per-key
delivery downstream of at-least-once sources).

Two modes, both pure Structured Streaming state ops (no custom state):

- ``dedup_stream(keys=[...])`` — drop every record whose key was EVER
  seen. State grows with distinct keys; right for bounded key universes
  (symbol lists, user ids) or short-lived jobs.
- ``dedup_stream(keys=[...], within="10 minutes", ts_col="ts")`` — drop
  re-deliveries arriving within the watermark horizon
  (``dropDuplicatesWithinWatermark``): state is bounded by the horizon,
  the right tool for at-least-once transports (Kinesis/Kafka re-drives,
  Lambda retries — the reference's extractor retries on throttling,
  lambda/stock_extractor/lambda_function.py:88-119) where duplicates
  cluster near the original delivery.

Batch twin: on a non-streaming DataFrame both modes degrade to
``dropDuplicates(keys)`` — same call, one code path for backfill and
live, mirroring the windows.py batch/stream symmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    within: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """First-arrival-wins dedup on ``keys`` for batch or streaming input.

    ``within`` (event-time horizon, e.g. ``"10 minutes"``) bounds state
    via watermark + dropDuplicatesWithinWatermark; None keeps keys
    forever (unbounded state — see module docstring for when that's ok).
    """
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    if within is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)
