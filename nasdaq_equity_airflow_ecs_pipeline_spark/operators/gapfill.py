"""Time-bucket gap-fill — the hypertable/TimescaleDB
``time_bucket_gapfill`` + ``locf()`` + ``interpolate()`` surface,
re-expressed as DataFrame ops.

Shape: one aggregation to per-(key, bucket) values, one tiny per-key
span aggregation, a ``sequence()``/``explode`` scaffold (dense bucket
range per key — generated, never shuffled in), a left join of actuals
onto the scaffold, and two window passes per key for the fills. Linear
in (keys x buckets); the only per-key state is the window sort, bounded
by that key's bucket count — the same cost profile as any rolling
metric, no driver loops, no UDFs.

Determinism contract: bucket values aggregate through the decimal-exact
``functions/stable.py`` path; interpolation uses integer day/bucket
offsets (``timestamp_diff`` on NTZ — TZ-independent) and one
fixed-order double expression, so results are bit-identical to the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_gapfill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_agg: Column,
    unit: str = "day",
) -> DataFrame:
    """Aggregate ``value_agg`` per (keys, date_trunc(unit, ts)) bucket,
    then densify each key's bucket range and fill the gaps twice over:

    - ``v``       — the aggregated value, NULL in gap buckets
    - ``v_locf``  — last observation carried forward (leading gaps stay
                    NULL: nothing to carry)
    - ``v_interp``— linear interpolation between the surrounding
                    observations (edge gaps fall back to the one-sided
                    neighbor, i.e. locf/nocb)

    The scaffold spans min..max bucket PER KEY (Timescale's default
    range-from-data behavior)."""
    bucket = F.date_trunc(unit, F.col(ts_col))
    actual = df.groupBy(
        *key_cols, bucket.alias("bucket")
    ).agg(value_agg.alias("v"))

    span = actual.groupBy(*key_cols).agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    scaffold = span.select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(_mn, _mx, interval 1 {unit})")
        ).alias("bucket"),
    )
    dense = scaffold.join(actual, [*key_cols, "bucket"], "left")

    w = Window.partitionBy(*key_cols).orderBy("bucket")
    prev_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    # carry (bucket, value) pairs so the interpolation knows HOW FAR the
    # neighboring observation is, not just its value
    obs = F.when(F.col("v").isNotNull(), F.struct("bucket", "v"))
    prev = F.last(obs, ignorenulls=True).over(prev_w)
    nxt = F.first(obs, ignorenulls=True).over(next_w)

    # integer bucket offsets: exact, TZ-independent NTZ arithmetic
    dist = lambda a, b: F.timestamp_diff(unit.upper(), a, b)  # noqa: E731
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev.isNull(), nxt["v"])  # leading gap -> nocb
        .when(nxt.isNull(), prev["v"])  # trailing gap -> locf
        .otherwise(
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (
                dist(prev["bucket"], F.col("bucket")).cast("double")
                / dist(prev["bucket"], nxt["bucket"]).cast("double")
            )
        )
    )
    return dense.select(
        *key_cols,
        "bucket",
        "v",
        prev["v"].alias("v_locf"),
        interp.alias("v_interp"),
    )
