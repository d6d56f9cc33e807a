"""Global ordering utilities: deterministic corpus shuffle and scalable
global row indexing.

A training pipeline's last step is a global shuffle: every example gets a
deterministic position in a pseudo-random total order (reproducible
epochs, resumable from any offset). The naive Spark spelling —
``row_number() OVER (ORDER BY key)`` with no partition — collapses the
whole dataset into ONE task; at 100 TB that is a non-starter.

``global_sort_index`` is the scale-correct two-pass enumerate:

1. range-partition + sort by the order key (Spark's normal distributed
   sort — sampled boundaries, all partitions sort in parallel);
2. count rows per partition (a ``k``-row collect, k = partition count);
3. prefix-sum the counts into per-partition offsets, broadcast them back,
   and add a per-partition ``row_number`` (window PARTITIONED by the
   range partition — parallel, no global window).

The result equals the single-partition window's answer exactly, but the
only serial work is the k-row prefix sum on the driver. The sorted frame
is localCheckpoint'd so pass 2 and pass 3 see the SAME partition
assignment (range boundaries come from sampling; recomputing the lineage
could legally re-draw them mid-query otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lsh import base_hash31


def global_sort_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "pos",
    partitions: int | None = None,
) -> DataFrame:
    """Add ``index_col`` = 0-based rank in the total order given by
    ``order_cols`` (which must be a unique key for a deterministic
    result). Equivalent to an unpartitioned ``row_number() - 1`` but
    executes as a distributed range sort."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parts = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["_pid"], r["_n"])
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in sizes:
        offsets.append((pid, acc))
        acc += cnt
    # dummy row keeps createDataFrame schema inference alive on empty input
    off_df = spark.createDataFrame(offsets or [(0, 0)], ["_pid", "_off"])
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(index_col, F.row_number().over(w) + F.col("_off") - F.lit(1))
        .drop("_pid", "_off")
    )


def shuffle_key(col, salt: str = "shuf42"):
    """Deterministic pseudo-random order key: portable 31-bit md5 hash of
    the id + salt. Changing the salt re-deals the whole order (one salt
    per epoch); the same salt reproduces it exactly on any engine."""
    c = F.col(col) if isinstance(col, str) else col
    return base_hash31(F.concat(c.cast("string"), F.lit(":" + salt)))


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuf42",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: hash ids with a salt,
    enumerate the hash total order (ties broken by id). Output keeps the
    key so consumers can verify or resume."""
    keyed = df.withColumn("shuffle_key", shuffle_key(id_col, salt))
    return global_sort_index(
        keyed, ["shuffle_key", id_col], index_col="pos", partitions=partitions
    )
