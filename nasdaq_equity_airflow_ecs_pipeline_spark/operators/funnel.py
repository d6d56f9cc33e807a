"""Ordered multi-step funnel analysis over an event stream.

Computes, per user, the earliest time each funnel step completes given
that every step must occur STRICTLY AFTER the previous one (the classic
product-analytics funnel: view -> click -> purchase). The reference
pipeline has no per-event analytics at all (its unit is a daily OHLCV
bar); this is the event-level counterpart a lakehouse needs.

Plan shape (scale notes):
- one aggregation per step, each a hash-agg keyed by the user column, so
  S steps cost S shuffles on the SAME key — Spark reuses the hash
  partitioning between them (no re-exchange between step joins; the
  plans show a single Exchange per step aggregate and sort-merge-free
  broadcast-or-colocated joins at typical dim sizes).
- state per user is one timestamp per step, O(S), never a row buffer —
  unlike a window-sort formulation this survives users with millions of
  events.
- strict `>` ordering makes the result insensitive to same-timestamp
  reorderings across engines; min() is order-independent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user that completed step 1, with columns
    ``t1..tS`` (earliest completion time of each step, null once the
    funnel breaks) and ``stage`` (number of steps completed).

    Step k's timestamp is ``min(ts | type = steps[k], ts > t_{k-1})`` —
    a chain of filtered hash-aggregates, one per step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        prev = f"t{k - 1}"
        # conditional min keeps users whose candidate events all precede
        # t_{k-1} (their t_k is null, funnel broken at k) — a filter
        # would drop them from the output entirely
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *[f"t{i}" for i in range(1, k)])
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(prev), F.col("_ts"))
                ).alias(f"t{k}")
            )
        )
    stage = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("stage", stage.cast("int"))
