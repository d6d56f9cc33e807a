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
    # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark rejects by
    # default; nanosAsLong is a runtime SQL conf, so set it here rather than
    # at session build time — the driver supplies its own SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # nanosecond timestamps arrive as long (spark.sql.legacy.parquet.nanosAsLong);
    # truncate to micros — same semantics as DuckDB's parquet reader.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer div — double division would lose precision at 1e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
