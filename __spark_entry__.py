"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship deterministic weekly OHLCV rollup
(SURVEY.md §2.6 A1 with the §4.3.1 determinism fix) on sf0.001.
``queries()``/``oracle_sql()`` expose the full operator inventory from
``nasdaq_equity_airflow_ecs_pipeline_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nasdaq_equity_airflow_ecs_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_weekly_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here get the driver's
    rows-only check (reserved for non-SQL-expressible operators)."""
    return dict(ORACLES)
