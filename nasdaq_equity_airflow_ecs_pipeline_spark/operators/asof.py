"""As-of join (point-in-time lookup): each left row gets the latest right
row with the same key and right.ts <= left.ts.

Spark has no ASOF JOIN operator. The naive formulations both fail at
scale: a theta-join on (key, r.ts <= l.ts) explodes to the full per-key
cross product before the "latest" filter, and a windowed subquery per
left row re-scans the right side. This implementation is the
union-tag-carry pattern: tag both sides, union, and per key carry the
most recent right payload forward with one ``last(ignorenulls)`` running
window — ONE shuffle on the key, a per-key sort, zero fan-out. The same
shape Flink's temporal join and kdb's aj compile to.

Tie rule: right rows sort BEFORE left rows at equal ts (<= semantics,
matching DuckDB ASOF JOIN's l.ts >= r.ts); among right rows with equal
(key, ts) the highest order_col wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    right_order_col: str,
    right_payload: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join. ``right_payload`` columns arrive as ``{prefix}{c}``
    (NULL when no right row precedes the left row). ``right_order_col``
    breaks equal-ts ties on the right side (highest wins)."""
    payload = F.struct(*[F.col(c).alias(c) for c in right_payload])
    r = right.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_order_col).alias("_rord"),
        payload.alias("_rp"),
    )
    l = left.select(
        "*",
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rord"].dataType).alias("_rord"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_first("_rord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_ts", "_side", "_rord", "_rp")
    for c in right_payload:
        out = out.withColumn(f"{prefix}{c}", F.col("_match")[c])
    return out.drop("_match")
