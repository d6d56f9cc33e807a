"""Skew-resistant aggregation: two-stage salted groupBy.

When a handful of hot keys dominate (power-law user activity, a few
mega-symbols), a plain groupBy sends each hot key's entire volume to one
reducer — the straggler that defines job latency at 100 TB. Salting
splits each key into ``buckets`` sub-keys for the first (heavy) partial
aggregation, then merges the per-salt partials with a second (tiny)
shuffle. AQE's skew-join splitting does not cover aggregations, so this
is the hand-rolled counterpart for ``groupBy``.

Only algebraic aggregates decompose this way; the helpers below cover
the sum/count/min/max family (avg = merged sum / merged count).

Measured guidance (tools/skew_stress.py, 60 M rows, 29 %-hot Zipf key,
EXPLAIN.md "Skew-stress"): ``salted_join`` cuts the naive shuffle
join's max task 13.7 s -> 3.5 s (straggler 8.7x -> 1.7x) at the cost of
``buckets x small-side`` replication; plain algebraic ``groupBy`` shows
NO straggler (map-side partial aggregation collapses the hot key before
the shuffle), so reach for ``salted_agg`` only when partials are
ineffective, and give the salted join ~3x cores shuffle partitions so
the salt combos don't ball-in-bin onto too few reducers.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def derive_salt_buckets(
    df: DataFrame,
    keys: list[str],
    n_cores: int,
    sample_fraction: float = 0.001,
    headroom: float = 2.0,
    seed: int = 7,
    max_buckets: int | None = None,
) -> int:
    """Data-driven salt factor from a cheap sampled key histogram.

    The rule (EXPLAIN.md "Skew-stress"): the hottest key holds
    ``top_share`` of the rows, so splitting it into
    ``top_share * n_cores`` salt buckets caps each bucket's volume at
    ~1/n_cores of the table — the load a single even reducer would
    carry anyway. ``headroom`` (default 2x) absorbs ball-in-bin
    variance when salt combos hash onto reducers (measured: 32 combos
    over 32 partitions left some reducers with 2-3 hot combos).

    Cost: one aggregate over a ``sample_fraction`` sample (~0.1% of
    rows), collected as TWO scalars — at 100 TB that is a 100 GB scan's
    worth of sampled rows through a map-side partial agg, the same
    cost class as AQE's own runtime statistics. A sample this size
    resolves top-key shares down to ~1% with thousands of sampled rows
    per percent; keys too cold to sample are keys too cold to salt.

    Clamped to [4, max_buckets or 4*n_cores]: below 4 salting is not
    worth the replication; above ~4x cores the small-side replication
    cost grows with no straggler left to cut.
    """
    row = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__top"), F.sum("__n").alias("__tot"))
        .collect()[0]
    )
    cap = max_buckets or 4 * n_cores
    if not row["__tot"]:
        return min(max(4, n_cores // 4), cap)  # empty sample: mild default
    top_share = row["__top"] / row["__tot"]
    return max(4, min(math.ceil(top_share * n_cores * headroom), cap))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation.

    ``partials``: name -> aggregate over raw rows (stage 1, keyed by
    keys + salt). ``merges``: name -> aggregate over stage-1 columns
    (stage 2, keyed by keys). E.g. sum: partial ``sum(x)``, merge
    ``sum(partial)``; count: partial ``count(1)``, merge ``sum``."""
    salt = (F.rand(seed=7) * buckets).cast("int")
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(n) for n, c in partials.items()])
    )
    return stage1.groupBy(*keys).agg(*[c.alias(n) for n, c in merges.items()])


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_col: Column,
    buckets: int = 32,
    sum_name: str = "sum_value",
    count_name: str = "n_rows",
) -> DataFrame:
    """Common case: per-key exact SUM + COUNT through the salted path.
    The sum is routed through decimal partials so the two-stage result is
    bit-identical to a single-stage (or single-threaded oracle) run."""
    return salted_agg(
        df,
        keys,
        partials={
            "_psum": F.sum(sum_col.cast("decimal(27,8)")),
            "_pcnt": F.count(F.lit(1)),
        },
        merges={
            sum_name: F.sum("_psum").cast("string").cast("double"),
            count_name: F.sum("_pcnt"),
        },
        buckets=buckets,
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    buckets: int | None = 8,
) -> DataFrame:
    """Skew-resistant inner equi join: salt the skewed side, replicate
    the other.

    A hot key sends its whole volume to one reducer in a plain shuffle
    join; AQE's skew-join splitting handles sort-merge joins it can
    observe, but not joins hidden behind later stages or non-SMJ plans.
    The manual form: the skewed side gets a deterministic per-row salt in
    ``[0, buckets)`` (hash of all columns — spreads even a single hot
    key), the small side is replicated ``buckets``× via one explode, and
    the join runs on (keys…, salt) — each hot key now occupies ``buckets``
    reducers. Replication costs ``buckets``× the SMALL side only; rows and
    results are exactly a plain inner join's.

    ``buckets=None`` derives the factor from the data via
    :func:`derive_salt_buckets` (sampled top-key share × cores ×
    headroom) — no hand tuning per key distribution.
    """
    if buckets is None:
        buckets = derive_salt_buckets(
            skewed, keys, skewed.sparkSession.sparkContext.defaultParallelism
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns], F.lit(7)),
        F.lit(buckets),
    ).cast("int")
    lft = skewed.withColumn("__salt", salt)
    rgt = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = lft.join(rgt, [*keys, "__salt"], "inner")
    return out.drop("__salt")
