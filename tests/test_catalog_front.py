"""Name-addressed catalog front (reference K7/S2 parity): 3-level
``catalog.db.table`` names resolve to warehouse paths, the existence
probe drives the CREATE vs MERGE branch exactly like
build_stock_fact_table.py:88-111, and the daily pipeline runs fully
name-addressed."""

from __future__ import annotations

import os

import pytest

from nasdaq_equity_airflow_ecs_pipeline_spark.sources.catalog import NameCatalog


def _cat(spark, tmp_path, **kw):
    return NameCatalog(
        spark, str(tmp_path / "wh"), catalog_name="glue_catalog", **kw
    )


def test_resolve_three_two_one_level_names(spark, tmp_path):
    c = _cat(spark, tmp_path, default_db="dev")
    root = c.root
    assert c.resolve("glue_catalog.dev.fact") == os.path.join(root, "dev", "fact")
    assert c.resolve("dev.fact") == os.path.join(root, "dev", "fact")
    assert c.resolve("fact") == os.path.join(root, "dev", "fact")


def test_resolve_rejects_foreign_catalog_and_bad_idents(spark, tmp_path):
    c = _cat(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown catalog"):
        c.resolve("other_catalog.db.t")
    with pytest.raises(ValueError, match="invalid identifier|malformed"):
        c.resolve("db.../../etc")
    with pytest.raises(ValueError, match="invalid identifier"):
        c.resolve("db.bad-table/x")
    with pytest.raises(ValueError, match="malformed|invalid"):
        c.resolve("a.b.c.d")


def test_existence_probe_drives_create_vs_merge(spark, tmp_path):
    """The reference branch (build_stock_fact_table.py:88-111): probe →
    CREATE when absent, MERGE on keys when present; a re-run of the same
    batch is a row-count no-op (the MERGE invariant)."""
    c = _cat(spark, tmp_path, default_db="dev")
    name = "glue_catalog.dev.fact_stock_daily_price"
    day1 = spark.createDataFrame(
        [("AAPL", "2024-01-02", 185.0), ("MSFT", "2024-01-02", 370.0)],
        "symbol string, trade_date string, close double",
    )
    assert not c.table_exists(name)
    # a bare handle must not make the table spring into existence
    c.table(name)
    assert not c.table_exists(name)

    c.create_or_merge(name, day1, keys=["symbol", "trade_date"])  # CREATE
    assert c.table_exists(name)
    assert c.read(name).count() == 2

    day2 = spark.createDataFrame(
        [("AAPL", "2024-01-03", 186.0), ("AAPL", "2024-01-02", 185.5)],
        "symbol string, trade_date string, close double",
    )
    c.create_or_merge(name, day2, keys=["symbol", "trade_date"])  # MERGE
    rows = {
        (r.symbol, r.trade_date): r.close for r in c.read(name).collect()
    }
    assert rows == {
        ("AAPL", "2024-01-02"): 185.5,  # updated
        ("MSFT", "2024-01-02"): 370.0,  # survivor
        ("AAPL", "2024-01-03"): 186.0,  # inserted
    }
    # idempotent re-run: same keys, no growth
    c.create_or_merge(name, day2, keys=["symbol", "trade_date"])
    assert c.read(name).count() == 3
    # time travel still works through the name (versioned layout)
    assert c.read(name, version=0).count() == 2

    assert c.list_tables("dev") == [name]


def test_pipeline_runs_name_addressed(spark, tmp_path):
    """run_pipeline with a catalog: every table lands at the resolver's
    path for ``db.table`` and the outputs equal the path-addressed run."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.plans.pipeline import run_pipeline

    c = _cat(spark, tmp_path)
    by_name = run_pipeline(
        spark, str(tmp_path / "wh_raw"), "2024-01-03",
        catalog=c, database="nasdaq_airflow_warehouse_dev",
    )
    by_path = run_pipeline(spark, str(tmp_path / "plain"), "2024-01-03")

    for t, p in by_name.items():
        assert p == c.resolve(f"nasdaq_airflow_warehouse_dev.{t}")
        assert c.table_exists(f"glue_catalog.nasdaq_airflow_warehouse_dev.{t}")
        a = spark.read.parquet(p)
        b = spark.read.parquet(by_path[t])
        cols = sorted(set(a.columns) - {"created_at", "updated_at"})
        assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
            map(tuple, b.select(*cols).collect())
        ), f"{t} differs between name- and path-addressed runs"
