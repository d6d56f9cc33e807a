"""Orchestration parity: the pipeline as named tasks with explicit
dependencies, runnable under Airflow or standalone.

The reference schedules 9 sequential tasks in Airflow
(docker/dags/nasdaq_stock_pipeline_with_gx.py:312-319); its non-GX DAG
runs fact and dims in parallel (docker/dags/nasdaq_stock_pipeline.py:261).
This module declares that task graph ONCE, engine-side, and offers two
executors: ``build_airflow_dag`` (only if airflow is importable — it is
not baked into this image) and ``run_local`` (dependency-ordered,
in-process). Either way the transformation code is identical —
orchestration is a thin shell, which is the point.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import SparkSession

from ..quality.expectations import assert_suite, reference_suites
from .pipeline import run_pipeline


def task_graph(
    spark_factory: Callable[[], SparkSession],
    warehouse: str,
    processing_date: str,
    raw_root: str | None = None,
) -> tuple[dict[str, Callable[[], None]], list[tuple[str, str]]]:
    """(tasks, edges). Tasks mirror the reference DAG: one extract+build
    stage per Glue job, then one validation task per GX checkpoint."""
    state: dict[str, dict[str, str]] = {}

    def build() -> None:
        spark = spark_factory()
        state["paths"] = run_pipeline(
            spark, warehouse, processing_date, raw_root=raw_root, validate=False
        )

    def validator(table: str, cols_attr: str) -> Callable[[], None]:
        def run() -> None:
            from .. import schemas

            spark = spark_factory()
            path = state["paths"][table]
            df = spark.read.parquet(path).select(*getattr(schemas, cols_attr))
            assert_suite(df, reference_suites()[table])

        return run

    tasks = {
        "extract_and_build": build,
        "validate_dimensions_quality": validator("dim_stock", "DIM_STOCK_COLUMNS"),
        "validate_facts_quality": validator("fact_stock_daily_price", "FACT_COLUMNS"),
        "validate_weekly_agg_quality": validator(
            "agg_stock_weekly_metrics", "AGG_WEEKLY_COLUMNS"
        ),
        "validate_monthly_agg_quality": validator(
            "agg_stock_monthly_metrics", "AGG_MONTHLY_COLUMNS"
        ),
    }
    edges = [
        ("extract_and_build", "validate_dimensions_quality"),
        ("validate_dimensions_quality", "validate_facts_quality"),
        ("validate_facts_quality", "validate_weekly_agg_quality"),
        ("validate_weekly_agg_quality", "validate_monthly_agg_quality"),
    ]
    return tasks, edges


def run_local(
    spark_factory: Callable[[], SparkSession],
    warehouse: str,
    processing_date: str,
    raw_root: str | None = None,
) -> list[str]:
    """Dependency-ordered in-process execution; returns task order run."""
    tasks, edges = task_graph(spark_factory, warehouse, processing_date, raw_root)
    deps: dict[str, set[str]] = {t: set() for t in tasks}
    for a, b in edges:
        deps[b].add(a)
    done: list[str] = []
    while len(done) < len(tasks):
        ready = [t for t in tasks if t not in done and deps[t] <= set(done)]
        if not ready:
            raise RuntimeError("task graph has a cycle")
        for t in sorted(ready):
            tasks[t]()
            done.append(t)
    return done


def build_airflow_dag(
    warehouse: str,
    schedule: str = "0 2 * * *",
    dag_id: str = "nasdaq_stock_pipeline_spark",
):
    """Airflow wrapper (reference cadence: daily 02:00 UTC over T-1).
    Import-guarded — airflow is not in this image; on an Airflow worker
    this returns a ready DAG with the same task names as the reference."""
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as e:  # pragma: no cover - airflow not installed here
        raise ImportError("apache-airflow is not installed") from e

    from datetime import datetime, timedelta  # pragma: no cover

    def factory():  # pragma: no cover
        from ..session import get_spark

        return get_spark("airflow_task")

    def dated_tasks(**ctx):  # pragma: no cover
        d = (ctx["logical_date"] - timedelta(days=1)).strftime("%Y-%m-%d")
        return task_graph(factory, warehouse, d)

    dag = DAG(dag_id, schedule=schedule, start_date=datetime(2024, 1, 1), catchup=False)  # pragma: no cover
    with dag:  # pragma: no cover
        def make(name):
            def call(**ctx):
                tasks, _ = dated_tasks(**ctx)
                tasks[name]()
            return PythonOperator(task_id=name, python_callable=call)

        ops = {n: make(n) for n in (
            "extract_and_build", "validate_dimensions_quality",
            "validate_facts_quality", "validate_weekly_agg_quality",
            "validate_monthly_agg_quality",
        )}
        _, edges = task_graph(factory, warehouse, "1970-01-01")
        for a, b in edges:
            ops[a] >> ops[b]
    return dag


def main(argv: list[str] | None = None) -> None:
    """CLI entry (Glue-job arg parity: --processing_date required)."""
    import argparse

    p = argparse.ArgumentParser(description="Run the daily pipeline")
    p.add_argument("--processing_date", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--raw_root", default=None)
    args = p.parse_args(argv)

    from ..session import get_spark

    order = run_local(
        lambda: get_spark("pipeline_cli"),
        args.warehouse,
        args.processing_date,
        raw_root=args.raw_root,
    )
    print(f"completed tasks: {order}")


if __name__ == "__main__":
    main()
