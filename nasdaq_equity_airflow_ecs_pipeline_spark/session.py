"""SparkSession factory.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the same
config block is what we would ship to a 1000-executor cluster — only
``master``/memory sizing change. Scale-relevant choices:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a high initial value, so we set the initial
  partitions and let AQE shrink.
- UTC session timezone (oracle comparability + cluster determinism).
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nasdaq_equity_airflow_ecs_pipeline_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan parallelism floor for small inputs: the default 4 MiB
        # spark.sql.files.openCostInBytes floors the split size, so a
        # single few-MB parquet file scans as ONE task and any
        # zero-shuffle narrow-map query serializes on it. 128 KiB lets
        # bytesPerCore (= input / minPartitionNum) win for small files;
        # at production scale bytesPerCore >> 4 MiB so the value is
        # inert there (split size is maxPartitionBytes either way) —
        # it only parameterizes how aggressively many-tiny-file scans
        # pack, hence the env override.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(128 * 1024)),
        )
        # Defensive: some writers emit TIMESTAMP(NANOS); read as long and
        # normalize in sources.tables (truncation to micros, like DuckDB).
        # Harmless for micros files; sources.tables also sets it at runtime
        # so driver-supplied bare sessions behave identically.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # ad-hoc config experiments without code edits, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.coalescePartitions.initialPartitionNum=128"
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, env_conf.split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
