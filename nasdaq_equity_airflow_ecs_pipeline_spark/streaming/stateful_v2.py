"""Per-key running totals on the Spark 4 ``transformWithStateInPandas``
API — the successor to ``applyInPandasWithState`` (streaming/stateful.py
keeps the classic form; both are exercised so either migration direction
is covered).

What the new API buys at scale, and why the engine adopts it for new
stateful operators:

- **Composable typed state**: named state variables (ValueState /
  ListState / MapState) with per-variable TTL instead of one monolithic
  state tuple — idle keys age out variable-by-variable, which is the
  knob that keeps an unbounded key space from pinning the state store.
- **Lifecycle hooks**: ``init`` / ``handleInputRows`` / ``close`` give
  the processor a place to set up state handles once per partition
  rather than re-deriving them per batch.
- **Timers** (processing/event time) for timeout-driven emission —
  expressible here without the old API's single GroupStateTimeout mode.

State remains keyed by group, Arrow-batched, checkpointed exactly-once;
the TTL below mirrors what stateful.py documents as the 100 TB
requirement for unbounded key spaces.

ENVIRONMENT GATE: the transformWithState driver worker speaks protobuf
to the JVM (`pyspark/sql/streaming/transform_with_state_driver_worker
.py` imports `google.protobuf`); in containers without the protobuf
package the query crashes at initialization, so callers should check
``TWS_AVAILABLE`` first and fall back to streaming/stateful.py's
``applyInPandasWithState`` form — same semantics, no protobuf
dependency. The test suite skips the v2 test when protobuf is absent.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:
    # find_spec on a dotted name imports the parent package, so a missing
    # 'google' raises instead of returning None
    TWS_AVAILABLE = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    TWS_AVAILABLE = False

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState (n, s) per key, updated each micro-batch; emits the
    key's new cumulative row whenever it sees input."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n bigint, s double"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, s = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._state.update((n, s))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": s}]
        )

    def close(self) -> None:
        pass


def running_totals_v2(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    if not TWS_AVAILABLE:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; use "
            "streaming.stateful.running_totals (applyInPandasWithState) "
            "in this environment"
        )
    return events.groupBy(key_col).transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
