"""Slowly-changing-dimension type 2 builder (validity-interval history).

The reference maintains type-1 dimensions (latest value wins —
glue/jobs/build_stock_dimensions.py:112-118 overwrites dim rows on every
run). SCD2 is the standard extension a warehouse user expects next: keep
every historical attribute value with ``[valid_from, valid_to)`` intervals
and an ``is_current`` flag, so fact rows can join to the dimension *as of*
their own timestamp.

Spark-first plan: one shuffle keyed by the dimension key; run-collapse and
interval assignment are per-key window functions (bounded partitions — no
global sort). The gaps-and-islands rewrite below is the relational
formulation, so Catalyst plans exactly two window operators over a single
exchange and the whole thing scales linearly with the change log:

1. change detection: ``lag(attrs)`` per key, ordered by (ts, tiebreak) —
   a row opens a new version iff its attributes differ from the previous
   row's (first row always opens).
2. island id: running sum of the change flag → version number.
3. interval bounds: group by (key, version): ``valid_from = min(ts)``,
   ``valid_to = lead(valid_from)`` over the versions (NULL = current).

At 100 TB the change log is partitioned by key hash; every step above is
key-local, so the plan is one exchange + windows + one partial-combine
aggregate. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change-event log into SCD2 validity intervals.

    Returns one row per (key, version-run): ``key, attrs…, version,
    valid_from, valid_to, is_current, n_events``. Consecutive rows (in
    ``ts_col`` order, per key) with identical ``attrs`` merge into one
    version; ``valid_to`` is the next version's ``valid_from`` (half-open
    intervals, NULL on the current version).

    ``order_tiebreak``: extra deterministic ordering column for equal
    timestamps (recommended — without it equal-ts runs are ambiguous).
    """
    order_cols = [F.asc(ts_col)] + (
        [F.asc(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)

    changed = _any_attr_changed(attrs, w)
    runs = (
        df.withColumn("__new_ver", changed)
        .withColumn(
            "__version",
            F.sum("__new_ver").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    per_ver = runs.groupBy(key, "__version", *attrs).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key).orderBy(F.asc("__version"))
    return (
        per_ver.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed("__version", "version")
    )


def _any_attr_changed(attrs: list[str], w: Window) -> Column:
    """1 when any tracked attribute differs from the previous row (null-safe),
    else 0; the first row per key (all lags null) counts as changed."""
    # False seed: with no tracked attrs nothing ever "changes", so every
    # key collapses to one version (instead of `~None` raising).
    conds = F.lit(False)
    for a in attrs:
        conds = conds | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    return F.when(
        F.row_number().over(w) == 1, F.lit(1)
    ).otherwise(conds.cast("int"))


def asof_dimension_lookup(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
) -> DataFrame:
    """Join each fact row to the dimension version valid at its timestamp:
    ``valid_from <= fact_ts < valid_to`` (current version: valid_to NULL).

    Equi-join on the key plus a residual interval predicate — for a
    dimension this is the standard shape (few versions per key, so the
    per-key match set is tiny and Spark's hash join + residual filter is
    optimal; no bucketing needed)."""
    d = dim.alias("__d")
    f = fact.alias("__f")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__d.{key}"))
        & (F.col(f"__f.{fact_ts}") >= F.col("__d.valid_from"))
        & (
            F.col("__d.valid_to").isNull()
            | (F.col(f"__f.{fact_ts}") < F.col("__d.valid_to"))
        )
    )
    return f.join(d, cond, "left")
