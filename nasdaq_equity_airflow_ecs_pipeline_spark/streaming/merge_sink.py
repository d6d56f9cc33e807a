"""Streaming MERGE sink: exactly-once keyed upsert from a stream.

Structured Streaming has no built-in MERGE sink; the standard pattern
(same as Delta's foreachBatch merge recipe) is: checkpoint tracks which
micro-batches committed, and the per-batch writer applies an IDEMPOTENT
keyed upsert — so a batch replayed after a crash re-merges the same
rows to the same result. Combined with operators/upsert.py's
copy-on-write this gives an incrementally-maintained, partition-pruned
table from a continuous feed: the streaming version of the reference's
nightly MERGE INTO (glue/jobs/build_stock_fact_table.py:104-111).

Dedup discipline: a micro-batch may contain several versions of one key
(late + newer rows together), so each batch is reduced latest-wins
BEFORE the merge — same W1 semantics as the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from ..operators.dedup import latest_wins
from ..operators.upsert import upsert_parquet_cow


def run_merge_stream(
    stream: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str],
    order_by: list[Column],
    checkpoint: str,
    available_now: bool = True,
):
    """Start a stream that MERGEs each micro-batch into ``path``.

    ``order_by``: descending-priority ordering that picks the surviving
    row per key within a batch (e.g. [desc(ts), desc(event_id)]).
    Returns the StreamingQuery; callers awaitTermination()."""

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        deduped = latest_wins(batch, keys, order_by)
        upsert_parquet_cow(spark, deduped, path, keys=keys, partition_by=partition_by)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_merge_stream_versioned(
    stream: DataFrame,
    table,  # operators.versioned.VersionedTable
    keys: list[str],
    order_by: list[Column],
    checkpoint: str,
    available_now: bool = True,
):
    """MERGE each micro-batch into a VersionedTable: every batch is an
    atomic manifest commit, so a crash between data write and manifest
    rename loses nothing visible and the checkpoint replays the batch
    into an identical new version (idempotent by keys)."""

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        table.upsert(latest_wins(batch, keys, order_by), keys)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
