"""Incremental raw-feed ingestion (streaming superset of reference S1/K1).

The reference lands one JSONL partition per day and reprocesses it with a
batch job (glue/jobs/build_stock_fact_table.py:28-32). Here the same
directory layout is consumed as a file stream: each micro-batch sees only
NEW files (exactly-once via the checkpoint's file log), so a backfill, a
late-arriving day, or a continuous feed all run through one code path.
``Trigger.AvailableNow`` gives the reference's daily-batch cadence —
drain everything pending, then stop — while keeping incremental state.

Scale notes: file listing is the bottleneck for huge raw prefixes —
``maxFilesPerTrigger`` bounds per-batch work, and the Hive-style
``date=`` partition dirs keep listing proportional to new days, not
history. The sink is an append-only partitioned table; idempotent
re-delivery is handled downstream by the keyed MERGE (operators/upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_QUOTE_SCHEMA


def read_quotes_stream(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream over Hive-partitioned raw JSONL (explicit schema — a
    streaming source cannot infer)."""
    reader = (
        spark.readStream.schema(RAW_QUOTE_SCHEMA)
        .option("basePath", root)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(f"{root}/date=*")


def run_ingest_available_now(
    quotes: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Drain all pending raw files into the partitioned bronze table and
    stop (the reference's daily batch, expressed incrementally)."""
    (
        quotes.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("date")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
