"""Every contract query with an oracle must match DuckDB exactly at the
driver's correctness scale (sf0.01) — the local twin of the driver gate.
"""

from __future__ import annotations

import pytest

from nasdaq_equity_airflow_ecs_pipeline_spark.queries import ORACLES, QUERIES

from .oracle_harness import compare, duck_connection

ORACLE_NAMES = sorted(ORACLES.keys())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    report = compare(df, duck, ORACLES[name])
    assert not report["type_lint"], report["type_lint"]
    assert report["rows_match"], report
    assert report["cols_match"], report
    assert report["values_match"], {k: v for k, v in report.items() if k != "first_diffs"} | {
        "first_diffs": report.get("first_diffs")
    }


def test_all_queries_have_fn():
    for name in ORACLES:
        assert name in QUERIES


def test_type_lint_catches_injected_hugeint(spark, sf_dir, duck):
    """The lint must catch the exact regression class that cost r1 (DECIMAL)
    and r2 (HUGEINT): a bare sum() left unCAST in the oracle SQL."""
    from .oracle_harness import type_lint

    bad = duck.sql("SELECT l_returnflag, sum(l_linenumber) AS s FROM lineitem GROUP BY 1")
    sdf = spark.createDataFrame([("A", 1)], "l_returnflag string, s long")
    problems = type_lint(sdf, bad)
    assert any("HUGEINT" in p for p in problems)

    dec = duck.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    assert any("DECIMAL" in p for p in type_lint(spark.createDataFrame([(1.5,)], "d double"), dec))

    clash = duck.sql("SELECT 1::BIGINT AS x")
    assert any(
        "clash" in p
        for p in type_lint(spark.createDataFrame([(1.0,)], "x double"), clash)
    )
