from __future__ import annotations

import pytest

from nasdaq_equity_airflow_ecs_pipeline_spark.quality.expectations import (
    assert_suite,
    columns_match,
    compound_unique,
    not_null,
    pair_a_ge_b,
    row_count_between,
    run_suite,
    unique,
    values_between,
    values_in_set,
)


def test_checks_single_scan(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 5.0), (2, "b", 8.0, 9.0), (2, None, 3.0, 1.0)],
        ["id", "name", "high", "low"],
    )
    results = run_suite(
        df,
        [
            columns_match(["id", "name", "high", "low"]),
            not_null("name"),
            unique("id"),
            compound_unique(["id", "name"]),
            row_count_between(1, 100),
            values_in_set("name", ["a", "b"]),
            values_between("high", 0, 9),
            pair_a_ge_b("high", "low"),
        ],
    )
    assert results["columns_match(4)"] == 0
    assert results["not_null(name)"] == 1
    assert results["unique(id)"] == 1
    assert results["compound_unique(id,name)"] == 0
    assert results["row_count_between(1,100)"] == 0
    # NULL name is not counted as out-of-set (GX semantics: null != violation)
    assert results["values_in_set(name)"] == 0
    assert results["values_between(high,0,9)"] == 1
    assert results["pair_a_ge_b(high,low)"] == 1


def test_reference_suites_full_parity():
    # exact enumeration of docker/scripts/create_expectations.py:
    # fact 8 / dim_stock 9 / weekly 9 / monthly 9 = 35 declared instances
    from nasdaq_equity_airflow_ecs_pipeline_spark.quality.expectations import (
        reference_suites,
    )

    suites = reference_suites()
    sizes = {k: len(v) for k, v in suites.items()}
    assert sizes == {
        "fact_stock_daily_price": 8,
        "dim_stock": 9,
        "agg_stock_weekly_metrics": 9,
        "agg_stock_monthly_metrics": 9,
    }
    names = {k: [c.name for c in v] for k, v in suites.items()}
    assert "values_in_set(symbol)" in names["dim_stock"]
    assert "not_null(company_name)" in names["dim_stock"]
    assert "not_null(week_close)" in names["agg_stock_weekly_metrics"]
    assert "not_null(month_close)" in names["agg_stock_monthly_metrics"]


def test_assert_suite_raises(spark):
    df = spark.createDataFrame([(1,), (1,)], ["id"])
    with pytest.raises(AssertionError, match="unique"):
        assert_suite(df, [unique("id")])


def test_quarantine_split_sql_oracle_null_symmetric(spark):
    """SQL_QUARANTINE_SPLIT must agree with quarantine_split on NULL-
    bearing data: a NULL comparison is not a violation, so NULL rows
    count as _valid in BOTH implementations (the oracle's exactness must
    not silently rest on lineitem being null-free)."""
    import duckdb
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.quality.expectations import (
        quarantine_split,
        values_between,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.reference import (
        SQL_QUARANTINE_SPLIT,
    )

    rows = [(10.0, 0.02), (None, 0.02), (50.0, None), (None, None), (50.0, 0.9)]
    df = spark.createDataFrame(rows, "l_quantity double, l_discount double")
    valid, invalid = quarantine_split(
        df,
        [values_between("l_quantity", 1, 45), values_between("l_discount", 0.0, 0.05)],
    )
    got = {("_valid", valid.count())}
    for r in (
        invalid.select(F.explode("_violations").alias("reason"))
        .groupBy("reason")
        .count()
        .collect()
    ):
        got.add((r["reason"], r["count"]))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({'NULL' if q is None else q}, {'NULL' if d is None else d})"
            for q, d in rows
        )
        + ") t(l_quantity, l_discount)"
    )
    oracle = set(con.execute(SQL_QUARANTINE_SPLIT).fetchall())
    # NULL rows: 3 of 5 have a NULL in some checked column, none of those
    # comparisons is a violation -> (None,None) and (None,0.02) and
    # (50,None)... 50 violates quantity. Expected: _valid = rows with no
    # TRUE violation.
    assert got == oracle


def test_quarantine_split_routes_rows(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.quality.expectations import (
        not_null,
        quarantine_split,
        values_between,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (4, None)],
        "id int, v double",
    )
    valid, invalid = quarantine_split(
        df, [not_null("v"), values_between("v", 0, 50)]
    )
    assert {r["id"] for r in valid.collect()} == {1}
    inv = {r["id"]: list(r["_violations"]) for r in invalid.collect()}
    # NULL v: flagged by not_null only (between on NULL is not a violation
    # under three-valued logic); 99 flagged by the range check only
    assert inv == {
        2: ["not_null(v)"],
        3: ["values_between(v,0,50)"],
        4: ["not_null(v)"],
    }
    assert valid.count() + invalid.count() == df.count()
