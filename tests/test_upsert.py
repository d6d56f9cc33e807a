from __future__ import annotations

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.upsert import (
    merge_upsert,
    upsert_parquet,
)


def test_merge_semantics(spark):
    target = spark.createDataFrame(
        [(1, "old", "2024-01-01"), (2, "keep", "2024-01-01")],
        ["k", "v", "first_seen"],
    )
    source = spark.createDataFrame(
        [(1, "new", "2024-01-02"), (3, "ins", "2024-01-02")],
        ["k", "v", "first_seen"],
    )
    out = merge_upsert(target, source, ["k"], preserve_cols=["first_seen"])
    rows = {r.k: (r.v, r.first_seen) for r in out.collect()}
    assert rows == {
        1: ("new", "2024-01-01"),   # matched: updated, first_seen preserved
        2: ("keep", "2024-01-01"),  # untouched survivor
        3: ("ins", "2024-01-02"),   # inserted
    }


def test_upsert_parquet_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    upsert_parquet(spark, src, path, keys=["k"])
    upsert_parquet(spark, src, path, keys=["k"])  # rerun: no dup rows
    assert spark.read.parquet(path).count() == 2
    upsert_parquet(
        spark, spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), path, ["k"]
    )
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
