"""Bounded-interval range join as an equi join.

The reference has no range/theta joins (SURVEY.md §2.5 — its only joins
are keyed equi/MERGE joins, glue/jobs/build_stock_aggregations.py:75-77);
this is part of the beyond-reference operator set. A naive range join
(`ON r.ts BETWEEN l.ts - W AND l.ts`) plans as a BroadcastNestedLoopJoin —
O(n*m) and a non-starter at 100 TB. For a BOUNDED window W the standard
rewrite is time-bucketing: bucket the right side by floor(epoch/W), have
each left row probe the (at most two) buckets its window overlaps, and
keep the exact range predicate as a residual on the equi join. Spark then
plans a plain hash join on (keys…, bucket): one shuffle per side, AQE
skew-handling applies, and the residual filter runs inside the join —
never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import epoch_sec


def preceding_window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
) -> tuple[DataFrame, Column]:
    """Join ``right`` rows whose ``right_ts`` falls in the half-open
    window ``[left_ts - window_seconds, left_ts)`` of a ``left`` row with
    equal ``keys``.

    Returns ``(joined, matched)`` where ``matched`` is a Column that is
    true on rows with a real right-side match (needed because with
    ``how="left"`` the unmatched left rows survive with nulls). Each
    matching right row pairs exactly once (its own bucket is unique),
    and with ``how="left"`` each left row yields EITHER its matches or
    exactly one all-null row — never both: the bucket explode's phantom
    unmatched copies are removed internally (window over a per-row id),
    so misuse by callers that forget to filter is impossible.

    Bucket arithmetic uses second-truncated epochs; ``floor(floor(x)/w)
    == floor(x/w)`` for integer ``w``, so truncation never moves a row
    across a bucket boundary, and the exact sub-second comparison lives
    in the residual predicate.
    """
    w = int(window_seconds)
    lsec = epoch_sec(F.col(f"__l.{left_ts}"))
    b_lo = F.floor((lsec - w) / w)
    b_hi = F.floor(lsec / w)

    # per-left-row id, assigned BEFORE the bucket explode: both exploded
    # copies of a row share it, so phantom unmatched copies can be
    # deduplicated after the join
    lft = (
        left.alias("__l")
        .withColumn("__lid", F.monotonically_increasing_id())
        .withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    )
    rgt = right.alias("__r").withColumn(
        "__bucket", F.floor(epoch_sec(F.col(f"__r.{right_ts}")) / w)
    )

    # full join condition: bucket + keys + residual range predicate (the
    # residual MUST live in the join condition — as a post-filter it
    # would silently drop the unmatched rows a left join must keep)
    conds = [lft["__bucket"] == rgt["__bucket"]]
    for k in keys:
        conds.append(F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    conds.append(
        F.col(f"__r.{right_ts}")
        >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {w} SECOND")
    )
    conds.append(F.col(f"__r.{right_ts}") < F.col(f"__l.{left_ts}"))
    joined = lft.join(rgt, on=_all(conds), how=how)
    matched = F.col(f"__r.{right_ts}").isNotNull()
    if how == "left":
        # A left row exploded into two buckets produces a spurious
        # all-null row from the matchless bucket alongside real matches
        # from the other (and two null rows when nothing matches). Keep
        # matched rows plus, per left row, the single first row — which
        # is a match when any exists — so exactly-one-null-or-all-matches
        # holds. One extra shuffle keyed by __lid, left-join only.
        from pyspark.sql import Window

        rank = F.row_number().over(
            Window.partitionBy("__lid").orderBy(
                matched.desc(), lft["__bucket"].asc()
            )
        )
        joined = (
            joined.withColumn("__rank", rank)
            .filter(matched | (F.col("__rank") == 1))
            .drop("__rank")
        )
    return joined.drop("__lid"), matched


def _all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
