"""Deduplication operators.

``latest_wins`` is the reference's W1 (row_number over partition/order,
glue/jobs/build_stock_fact_table.py:39-48) made deterministic: the caller
must supply a total order (tiebreakers included), because at 100 TB the
"arbitrary survivor" of ``dropDuplicates`` (reference W2,
build_stock_dimensions.py:65) silently changes between runs.

``exact_dedup`` is content-hash dedup for the training-data path: one
shuffle on the hash (narrow, 16-byte keys), min-key survivor. At scale the
hash groupBy is the cheapest possible exact dedup — no wide row compare,
and the shuffle key is uniform so no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    rank_col: str = "_rn",
) -> DataFrame:
    """Keep exactly one row per key: first under ``order_by`` (give a total
    order, e.g. [desc(ts), desc(unique_id)])."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Exact near-zero-cost dedup: md5 over the content columns, keep the
    min id per hash. Adds ``dup_count`` (cluster size) for observability.
    """
    h = F.md5(F.concat_ws("", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
