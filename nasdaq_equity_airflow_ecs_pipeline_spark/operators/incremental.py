"""Incremental aggregate maintenance: fold a delta batch into an
existing rollup WITHOUT rescanning the base data.

At 100 TB the difference between "recompute the daily rollup" and
"merge today's partition into it" is the whole batch-window budget: a
full recompute scans everything ever ingested; the incremental form
scans only the delta and shuffles only the delta's groups. The
requirement is algebraic aggregates — every measure kept as a
mergeable partial:

    count     -> sum of partial counts
    sum       -> sum of partial sums   (DECIMAL, so merge order is
                                        irrelevant — the repo's
                                        exactness discipline)
    min / max -> min / max of partials
    avg       -> derived sum/count at READ time, never stored

This is the same partial-aggregate contract Spark's own hash aggregate
uses map-side; the operator just persists the partials as a table and
replays the reduce side per batch. Verified against a full-recompute
oracle (q_incremental_rollup): merging per-batch partials equals the
one-shot aggregate bit-for-bit.

The streaming twin is `streaming/` windowed aggregation; this is the
batch/lakehouse form (upsert the merged groups back with
operators/upsert.py keyed on the group columns).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stable import _dec2dbl

DEC = "decimal(38,6)"


def partial_rollup(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Mergeable partial aggregate of one batch: (keys..., n, sum_dec,
    min_v, max_v). sum_dec stays DECIMAL so later merges commute."""
    v = F.col(value_col).cast(DEC)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Reduce any number of partial rollups (same schema) into one —
    associative and commutative, so batches can arrive in any order and
    the merge tree can be arbitrarily shaped (hourly -> daily ->
    monthly compaction)."""
    keys = [c for c in partials[0].columns
            if c not in ("n", "sum_dec", "min_v", "max_v")]
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").cast(DEC).alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_rollup(partial: DataFrame) -> DataFrame:
    """Read-time view over the stored partials: derived avg, decimal
    sum lowered to double through the stable string hop (no DECIMAL in
    the final schema — driver-hash discipline)."""
    keys = [c for c in partial.columns
            if c not in ("n", "sum_dec", "min_v", "max_v")]
    return partial.select(
        *keys,
        "n",
        _dec2dbl(F.col("sum_dec")).alias("sum_v"),
        (_dec2dbl(F.col("sum_dec")) / F.col("n").cast("double")).alias(
            "avg_v"
        ),
        "min_v",
        "max_v",
    )


def incremental_join_update(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Delta propagation for an inner equi join (insert-only deltas):

        Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB

    so the maintained join advances by processing only the deltas against
    the opposite side — never re-joining A_old with B_old. At 100 TB with
    a daily delta a thousandth the base size, that's the difference
    between three delta-sized joins (each with one small shuffled side,
    broadcastable when the delta is small) and one full-base shuffle.
    Returns ΔJ; the caller appends it to the stored join table (the
    insert-only analog of upsert, operators/upsert.py).
    """
    on = list(keys)
    return (
        da.join(b_old, on, "inner")
        .unionByName(a_old.join(db, on, "inner"))
        .unionByName(da.join(db, on, "inner"))
    )
