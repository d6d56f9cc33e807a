"""Custom stateful streaming operator: per-key running totals that
survive across micro-batches (``applyInPandasWithState``).

This is the escape hatch for stateful semantics the built-in windowed
aggregations can't express (decaying counters, ML feature state,
cross-batch dedup ledgers). State lives in the state store keyed by the
group — sized by distinct keys, not events — and the checkpoint makes it
exactly-once across restarts. Arrow-batched: Python sees pandas frames,
not rows.

At 100 TB of *events* this scales because state is per *key*; the knob
that matters is key cardinality. For unbounded key spaces add a timeout
(``GroupStateTimeout``) so idle keys age out instead of pinning the
store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def running_totals(events: DataFrame, key_col: str = "user_id",
                   value_col: str = "value") -> DataFrame:
    """Cumulative per-key event count + value sum, updated each
    micro-batch. Works identically on a batch frame? No — this one is
    streaming-only by design (state requires a stream); the batch
    equivalent is a plain groupBy, asserted in tests."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": s}]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
