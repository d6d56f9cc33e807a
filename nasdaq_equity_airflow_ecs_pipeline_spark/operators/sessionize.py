"""Sessionization: gap-based session assignment over an event stream.

Batch formulation (lag + running sum over a per-user window) — the same
result Structured Streaming's ``session_window`` produces, computed
relationally. One shuffle, keyed by user; the window sort is per-user
(bounded) so no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Add ``session_seq`` (per-user session ordinal, starting at 1).

    A new session starts when the gap to the previous event exceeds
    ``gap_seconds``. Total order (ts, id) per user for determinism.
    Microsecond-integer comparisons — engine-portable (epoch_us handles
    TIMESTAMP_NTZ, which ``unix_micros`` rejects)."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    us = epoch_us(ts_col)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
