"""Parquet / catalog table readers (reference S2: spark.table over Iceberg,
glue/jobs/build_stock_aggregations.py:45-55).

Locally the warehouse is parquet-on-disk; at cluster scale this swaps to a
real catalog (`spark.table`) with zero changes to downstream plans — every
consumer takes a DataFrame. Parquet scans get columnar vectorized reads,
predicate pushdown and partition pruning from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; falls back to ``spark.table`` for catalog names."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        return spark.table(name)
    # Writers vary in how they encode events.ts; normalize every layout to
    # TIMESTAMP_NTZ (wall-clock, session-TZ-independent — the same thing
    # DuckDB's reader produces, so oracle comparisons are representation-free).
    # nanosAsLong is a runtime SQL conf, so set it here rather than at session
    # build time — the driver supplies its own bare SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # INT64 TIMESTAMP(NANOS) read as raw nanos under nanosAsLong:
            # integer-div to micros (double math would lose precision at
            # 1e18), then attach to the NTZ epoch — pure integer arithmetic,
            # no timezone involved.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif isinstance(dt, T.TimestampType):
            # UTC-adjusted micros (isAdjustedToUTC=true): same instant as a
            # UTC wall-clock; convert_timezone pins the zone explicitly so
            # the result doesn't depend on spark.sql.session.timeZone.
            df = df.withColumn("ts", F.expr("convert_timezone('UTC', ts)"))
        # TimestampNTZType (isAdjustedToUTC=false micros): already canonical.
    return df


def widen_small_scan(df: DataFrame, key: str | None = None) -> DataFrame:
    """Scale-adaptive scan-parallelism floor for HEAVY per-row compute
    (optimization r13; guide §2.2/§6.1). FileSourceScan packs splits at
    ``max(openCostInBytes, inputBytes / defaultParallelism)``, so a
    few-MB parquet table scans as 1-2 tasks under the stock 4 MiB open
    cost — and a zero-shuffle row-expensive operator (char-n-gram
    hashing, Gopher repetition folds, sentence splitting) serializes on
    it regardless of core count. Round 12 attacked this with a GLOBAL
    ``openCostInBytes=128KiB`` default, which over-split every small
    scan and regressed the headline 1.8x (VERDICT r12 #1). This helper
    widens ONLY where the operator declares its work row-expensive, and
    only when the optimizer's size estimate says the scan cannot reach
    ``defaultParallelism`` splits: below the gate it hash-repartitions
    by the caller's key (deterministic row placement — never rand());
    above it (any production-scale input: bytes/cores >> 4 MiB) it is a
    NO-OP and the zero-shuffle plan shape is preserved. Checkpointed /
    shuffled inputs report large or unknown sizes and pass through
    untouched. The explicit partition count pins the exchange against
    AQE re-coalescing (these partitions are deliberately tiny in bytes
    but expensive in CPU). Results are unchanged: consumers are per-row
    projections or aggregations, and the driver compares sorted rows."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes"))
    except Exception:
        return df
    if size > par * open_cost:
        return df
    return df.repartition(par, F.col(key)) if key else df.repartition(par)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def build_once(path: str, stamp: str, build_fn) -> bool:
    """Idempotent fixture/layout build: run ``build_fn()`` (which must
    populate ``path``) only when the ``_built_from`` marker under
    ``path`` does not match ``stamp``, then record the stamp. The ONE
    spelling of the marker protocol shared by every layout-building
    contract query (q_zorder_pruned_scan, q_ann_ivf_pruned): encode the
    source identity AND a layout-version token in the stamp so format
    changes rebuild automatically. Returns True when a build ran."""
    import os

    marker = os.path.join(path, "_built_from")
    if os.path.isfile(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return False
    build_fn()
    with open(marker, "w") as fh:
        fh.write(stamp)
    return True
