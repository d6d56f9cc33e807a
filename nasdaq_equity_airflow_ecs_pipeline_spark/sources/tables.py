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
