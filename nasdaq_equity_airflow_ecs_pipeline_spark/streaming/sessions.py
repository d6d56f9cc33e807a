"""Session-window aggregation (gap-based, event-time).

``F.session_window`` merges events into variable-length windows that
close after ``gap`` of inactivity — the streaming-native dual of
operators/sessionize.py's batch lag+cumsum formulation. Both produce the
same sessions; the batch variant keeps per-event rows (for labeling),
this one produces per-session aggregates and is the form that runs
incrementally with bounded state (watermark finalizes sessions whose
gap has provably expired).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
    sum_fn: Callable[[str], Column] = F.sum,
) -> DataFrame:
    """Per (user, session): bounds + count + sum. Session end is
    last-event-time + gap (Spark semantics; the DuckDB oracle reproduces
    it from the lag/cumsum session assignment)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_fn(value_col).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
