"""Event-time window aggregations (tumbling + hopping).

One transformation body serves batch and streaming: ``F.window`` is an
ordinary column expression, so the batch driver-contract queries
(q_tumbling_window / q_hopping_window) run the EXACT code the streaming
path runs — the only streaming-specific parts are the watermark and the
sink wiring, added by the caller.

Scale notes: a windowed groupBy is one hash-aggregate shuffle keyed by
(window, key) — uniform unless one key dominates (AQE skew handles it).
In streaming, the watermark bounds state: windows older than
(max event time - delay) are finalized and dropped from the state store.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
    sum_fn: Callable[[str], Column] = F.sum,
) -> DataFrame:
    """Per (tumbling window, key): count + sum. Pass ``watermark`` when
    ``events`` is a stream (bounds state; enables append output).
    ``sum_fn`` swaps in an order-stable aggregate (functions.stable.dsum)
    for oracle-exact batch runs."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_fn(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def hopping_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
    sum_fn: Callable[[str], Column] = F.sum,
) -> DataFrame:
    """Per (hopping/sliding window, key): count + sum. Each event lands in
    duration/slide windows — the fan-out is the expression, not a join."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_fn(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
