"""Stream-stream interval (event-time-bounded) join.

The reference has no streaming surface (SURVEY.md §2.10 — its weekly /
monthly rollups are calendar joins recomputed in batch); this module is
part of the engine's Structured-Streaming superset, covering the one
stateful-join shape Spark supports between two streams: an equi-key join
whose time condition bounds how long each side's rows stay in the state
store.

One transformation body serves batch and streaming (same pattern as
streaming/windows.py): the join condition is ordinary column expressions,
so the batch driver-contract query (q_stream_interval_join) executes the
EXACT code a `readStream` pipeline runs — the only streaming-specific
parts are the two watermarks, added when the inputs are streams.

Semantics (attribution-style): for each left event, every right event of
the same key with `left.ts <= right.ts <= left.ts + tolerance`. With
watermarks on BOTH sides, Spark derives the state retention for each
side from the time bound — left rows expire `tolerance` past the right
watermark, right rows as soon as the left watermark passes them. Without
the time bound a stream-stream join would keep unbounded state; this
module refuses to build one.

Scale notes: the physical plan is a hash-partition exchange of each side
on the join key + (in streaming) a symmetric stateful hash join, or (in
batch) a sort-merge join with the interval as a post-join residual
filter. That equi-key-first shape is the right one at 100 TB: state and
shuffle are both keyed by user, so they scale with keys, and the
residual range check is evaluated key-locally. AQE skew-join splits hot
keys in batch; in streaming a hot key is bounded by the interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tolerance: str = "1 hour",
    watermark: str | None = None,
    prefixes: tuple[str, str] = ("l_", "r_"),
    how: str = "inner",
) -> DataFrame:
    """Equi-key + interval join: rows of ``right`` within
    ``[left.ts, left.ts + tolerance]`` for the same key. Pass
    ``watermark`` when the inputs are streams (applied to both sides;
    required by Spark for state cleanup in stream-stream joins).

    ``how``: inner | left_outer | right_outer | full_outer. Outer
    semantics in streaming differ from batch BY DESIGN: an unmatched row
    is emitted (null-padded) only once the other side's watermark has
    passed its interval — i.e. when a match has become impossible. Rows
    still inside the final watermark window at end-of-stream are held
    back, so a batch left join is a SUPERSET of the streamed one; the
    matched subsets are identical. (This is Spark's contract, not a
    quirk of this wrapper — it is what makes outer results correct
    instead of speculative.)

    Columns are disambiguated by prefixing every non-key column, so the
    output schema is stable regardless of overlapping input names:
    (key, l_<cols...>, r_<cols...>).
    """
    lp, rp = prefixes
    if how not in {"inner", "left_outer", "right_outer", "full_outer"}:
        raise ValueError(f"unsupported join type {how!r}")
    if watermark is not None:
        left = left.withWatermark(ts_col, watermark)
        right = right.withWatermark(ts_col, watermark)
    lren = left.select(
        F.col(key_col),
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns if c != key_col],
    )
    rren = right.select(
        F.col(key_col).alias(f"{rp}{key_col}"),
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns if c != key_col],
    )
    lts, rts = F.col(f"{lp}{ts_col}"), F.col(f"{rp}{ts_col}")
    cond = (
        (F.col(key_col) == F.col(f"{rp}{key_col}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {tolerance}"))
    )
    out = lren.join(rren, cond, how)
    if how in {"right_outer", "full_outer"}:
        # key_col is null for right-only rows; surface the surviving key
        out = out.withColumn(
            key_col, F.coalesce(F.col(key_col), F.col(f"{rp}{key_col}"))
        )
    return out.drop(f"{rp}{key_col}")
