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
    assert report["rows_match"], report
    assert report["cols_match"], report
    assert report["values_match"], {k: v for k, v in report.items() if k != "first_diffs"} | {
        "first_diffs": report.get("first_diffs")
    }


def test_all_queries_have_fn():
    for name in ORACLES:
        assert name in QUERIES
