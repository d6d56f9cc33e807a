"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the fact⋈fact or fact⋈big-dim join's shuffle IS the job cost.
Bucketing writes each table hash-partitioned by the join key into a fixed
number of buckets at write time; a later equi-join of two tables bucketed
the same way (same key, same bucket count) reads co-located splits and
joins with ZERO Exchange on either side — the shuffle is paid once at
write, amortized over every subsequent join/aggregation on that key.

Spark needs a catalog table (``saveAsTable``) for bucket metadata; plain
``.parquet(path)`` writes lose it. The same layout maps to Iceberg's
``bucket(N, col)`` partition transform at cluster scale.

tests/test_scale_plans.py asserts the no-Exchange plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs Catalyst
    plans SortMergeJoin over the bucketed scans with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
