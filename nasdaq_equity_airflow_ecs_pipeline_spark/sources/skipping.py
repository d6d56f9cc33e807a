"""Data-skipping reads over a Z-ordered layout (manifest-driven file
pruning) — the consumer side of ``operators/zorder.py``.

The reference delegates all scan pruning to Iceberg file statistics +
partition layout (`terraform/modules/glue/main.tf:79` wires the Iceberg
SparkCatalog; SURVEY.md §4.1). This module reproduces that loop locally
with plain parquet: write the clustered layout with ``zbucket`` as a
Hive partition directory, persist the per-bucket min/max spans as a
manifest, then answer range-filtered scans by consulting the manifest
FIRST and reading only overlapping buckets.

Why this is the at-scale shape:

- The manifest is bucket-count-sized (one row per would-be file), so
  consulting it is a metadata operation — same cost class as Iceberg's
  manifest scan, and the collect it does is bounded by the file count,
  never the data (the ``operators/upsert.py`` partition-values precedent).
- Pruning happens via Catalyst partition pruning on the ``zbucket``
  directory column (`PartitionFilters` in the scan node), so skipped
  buckets are never LISTED, let alone read — the scan's input files
  shrink, not just its row count. The row-level residual filter still
  applies inside surviving buckets.
- Because the layout is Z-ordered on BOTH columns, range predicates on
  either column (or both) prune; a single-column sort layout would prune
  on one column only. ``tests/test_dimension_ops.py`` asserts the
  pruned file count, not just result equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.zorder import zorder_layout, zorder_skipping_stats

MANIFEST_DIR = "_zmanifest"


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_buckets: int = 16,
) -> None:
    """Cluster ``df`` on (col_x, col_y) via Morton code and write it as
    parquet partitioned by ``zbucket`` (each bucket = a would-be file
    group), plus a per-bucket min/max manifest under ``_zmanifest``."""
    coded = zorder_layout(df, col_x, col_y, n_buckets)
    layout = coded.drop("zcode")
    layout.write.mode("overwrite").partitionBy("zbucket").parquet(path)
    # re-read what was written so the manifest describes the files as
    # they exist on disk (one extra metadata-cheap pass, no staleness)
    written = layout.sparkSession.read.parquet(path)
    zorder_skipping_stats(written, col_x, col_y).write.mode(
        "overwrite"
    ).parquet(f"{path}/{MANIFEST_DIR}")


def pruned_scan(
    spark: SparkSession,
    path: str,
    x_range: tuple[int, int] | None = None,
    y_range: tuple[int, int] | None = None,
    x_col: str | None = None,
    y_col: str | None = None,
) -> DataFrame:
    """Range-filtered scan that reads only manifest-overlapping buckets.

    Returns the same rows a full scan + filter would (the residual
    filter is still applied), but the parquet source lists only the
    surviving ``zbucket=`` directories — check ``df.inputFiles()`` or
    the scan node's ``PartitionFilters`` for the proof.
    """
    manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    cond = F.lit(True)
    if x_range is not None:
        cond = cond & (F.col("x_max") >= x_range[0]) & (
            F.col("x_min") <= x_range[1]
        )
    if y_range is not None:
        cond = cond & (F.col("y_max") >= y_range[0]) & (
            F.col("y_min") <= y_range[1]
        )
    # metadata-sized collect: one small row per bucket/file-group
    keep = [int(r["zbucket"]) for r in manifest.filter(cond).select("zbucket").collect()]
    if not keep:
        return spark.read.option("basePath", path).parquet(path).limit(0)
    # hand the reader the pruned directory list (the Iceberg manifest
    # pattern): skipped buckets are never LISTED, let alone read — a
    # `.filter(zbucket.isin(...))` would prune at physical planning but
    # still pay the full file listing, which at 100 TB is itself a cost
    scan = spark.read.option("basePath", path).parquet(
        *[f"{path}/zbucket={b}" for b in sorted(keep)]
    )
    if x_range is not None and x_col:
        scan = scan.filter(F.col(x_col).between(*x_range))
    if y_range is not None and y_col:
        scan = scan.filter(F.col(y_col).between(*y_range))
    return scan
