"""Declarative data-quality checks — the reference's Great Expectations
suites (V1-V8, docker/scripts/create_expectations.py, 35 declared check
instances across 4 suites: fact 8 / dim_stock 9 / weekly 9 / monthly 9)
re-expressed as Spark assertions that run in-process against the
just-written tables instead of through Athena. (The reference's own
IMPLEMENTATION_SUMMARY.md:132 advertises "38 checks", but the script it
cites declares 35 — the enumeration here follows the code, the ground
truth; see q_gx_census for the driver-checked census.)

Each check compiles to ONE aggregate expression; ``run_suite`` evaluates
a whole suite in a SINGLE Spark job (one pass over the table) — at 100 TB
you cannot afford one scan per expectation, and sampling LIMIT tricks
(create_expectations.py:35-39) become unnecessary when the checks share
a scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    # aggregate expression counting violations (0 == pass); None for
    # schema-level checks evaluated without a scan
    violations: Column | None = None
    schema_fn: Callable[[DataFrame], bool] | None = None
    # per-row violation predicate, for checks whose failure is a property
    # of a single row (not_null / in_set / between / pair) — powers
    # quarantine_split; table-level checks (unique, row counts) leave it
    # None because no single row "is" the violation
    row_pred: Column | None = None


def columns_match(expected: list[str]) -> Check:
    """V1: expect_table_columns_to_match_ordered_list."""
    return Check(
        name=f"columns_match({len(expected)})",
        schema_fn=lambda df, e=tuple(expected): tuple(df.columns) == e,
    )


def not_null(col: str) -> Check:
    """V2: expect_column_values_to_not_be_null."""
    return Check(
        f"not_null({col})",
        F.count(F.when(F.col(col).isNull(), 1)),
        row_pred=F.col(col).isNull(),
    )


def unique(col: str) -> Check:
    """V3: expect_column_values_to_be_unique (count - distinct == 0)."""
    return Check(
        f"unique({col})",
        F.count(F.col(col)) - F.count_distinct(F.col(col)),
    )


def compound_unique(cols: list[str]) -> Check:
    """V4: expect_compound_columns_to_be_unique."""
    # distinct over a struct: tuples containing NULLs still count as rows
    # (bare multi-column count_distinct silently drops them)
    return Check(
        f"compound_unique({','.join(cols)})",
        F.count(F.lit(1)) - F.count_distinct(F.struct(*[F.col(c) for c in cols])),
    )


def row_count_between(lo: int, hi: int) -> Check:
    """V5: expect_table_row_count_to_be_between."""
    n = F.count(F.lit(1))
    return Check(
        f"row_count_between({lo},{hi})",
        F.when(n.between(lo, hi), 0).otherwise(1),
    )


def values_in_set(col: str, allowed: list) -> Check:
    """V6: expect_column_values_to_be_in_set."""
    return Check(
        f"values_in_set({col})",
        F.count(F.when(~F.col(col).isin(allowed), 1)),
        row_pred=~F.col(col).isin(allowed),
    )


def values_between(col: str, lo, hi) -> Check:
    """V7: expect_column_values_to_be_between."""
    return Check(
        f"values_between({col},{lo},{hi})",
        F.count(F.when(~F.col(col).between(lo, hi), 1)),
        row_pred=~F.col(col).between(lo, hi),
    )


def pair_a_ge_b(a: str, b: str) -> Check:
    """V8: expect_column_pair_values_A_to_be_greater_than_B (or equal)."""
    return Check(
        f"pair_a_ge_b({a},{b})",
        F.count(F.when(F.col(a) < F.col(b), 1)),
        row_pred=F.col(a) < F.col(b),
    )


def quarantine_split(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame]:
    """Route rows instead of failing the table: returns (valid, invalid)
    where ``invalid`` carries a ``_violations`` array naming every
    row-level check the row failed (the badRecordsPath pattern, but with
    machine-readable reasons and no side-channel files).

    Only checks with a ``row_pred`` participate; table-level checks
    belong in run_suite/assert_suite. One pass, pure column expressions
    — the split is two filters over the same scan (at the lake boundary
    you write both outputs from one job; Spark reuses the scan via
    exchange reuse or you persist() the flagged frame).

    Null semantics follow SQL three-valued logic: a NULL comparison is
    not a violation (only ``not_null`` flags nulls) — identical on the
    DuckDB oracle side, which is what makes q_quarantine_split exact.
    """
    preds = [(c.name, c.row_pred) for c in checks if c.row_pred is not None]
    if not preds:
        raise ValueError("no row-level checks (row_pred) in suite")
    reasons = F.filter(
        F.array(*[
            F.when(p, F.lit(name)).otherwise(F.lit(None)) for name, p in preds
        ]),
        lambda x: x.isNotNull(),
    )
    flagged = df.withColumn("_violations", reasons)
    valid = flagged.filter(F.size("_violations") == 0).drop("_violations")
    invalid = flagged.filter(F.size("_violations") > 0)
    return valid, invalid


def run_suite(df: DataFrame, checks: list[Check]) -> dict[str, int]:
    """Evaluate all checks in one scan. Returns {check_name: violations};
    0 means pass. Schema checks evaluate driver-side (no scan)."""
    results: dict[str, int] = {}
    agg_checks = [c for c in checks if c.violations is not None]
    for c in checks:
        if c.schema_fn is not None:
            results[c.name] = 0 if c.schema_fn(df) else 1
    if agg_checks:
        row = df.agg(
            *[c.violations.alias(f"c{i}") for i, c in enumerate(agg_checks)]
        ).collect()[0]
        for i, c in enumerate(agg_checks):
            results[c.name] = int(row[i] or 0)
    return results


def assert_suite(df: DataFrame, checks: list[Check]) -> dict[str, int]:
    """run_suite, raising on any violation (parity with the reference's
    failing Airflow validation tasks,
    docker/dags/nasdaq_stock_pipeline_with_gx.py:196-217)."""
    results = run_suite(df, checks)
    failed = {k: v for k, v in results.items() if v}
    if failed:
        raise AssertionError(f"quality suite failed: {failed}")
    return results


def reference_suites() -> dict[str, list[Check]]:
    """The four reference suites (create_expectations.py:23-280), keyed by
    table. Column lists from FIXTURES.md §2."""
    from ..schemas import (
        AGG_MONTHLY_COLUMNS,
        AGG_WEEKLY_COLUMNS,
        DIM_STOCK_COLUMNS,
        FACT_COLUMNS,
    )

    return {
        "fact_stock_daily_price": [
            columns_match(FACT_COLUMNS),
            not_null("fact_key"),
            not_null("stock_symbol"),
            not_null("trade_date"),
            not_null("close_price"),
            unique("fact_key"),
            compound_unique(["stock_symbol", "trade_date"]),
            row_count_between(1, 100),
        ],
        "dim_stock": [
            columns_match(DIM_STOCK_COLUMNS),
            not_null("stock_key"),
            not_null("symbol"),
            not_null("company_name"),
            unique("stock_key"),
            unique("symbol"),
            # create_expectations.py:125-133 — the pipeline's fixed universe
            values_in_set("symbol", ["AAPL", "MSFT", "GOOGL", "AMZN", "META"]),
            values_in_set("is_active", [True, False]),
            row_count_between(1, 100),
        ],
        "agg_stock_weekly_metrics": [
            columns_match(AGG_WEEKLY_COLUMNS),
            not_null("year"),
            not_null("week"),
            not_null("symbol"),
            not_null("week_close"),
            compound_unique(["year", "week", "symbol"]),
            values_between("week", 1, 53),
            values_between("avg_price", 0, 10000),
            pair_a_ge_b("week_high", "week_low"),
        ],
        "agg_stock_monthly_metrics": [
            columns_match(AGG_MONTHLY_COLUMNS),
            not_null("year"),
            not_null("month"),
            not_null("symbol"),
            not_null("month_close"),
            compound_unique(["year", "month", "symbol"]),
            values_between("month", 1, 12),
            values_between("avg_price", 0, 10000),
            pair_a_ge_b("month_high", "month_low"),
        ],
    }
