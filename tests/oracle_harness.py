"""Local replica of the driver's correctness gate: run a contract query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and an order-insensitive value
representation. Stricter than necessary is fine — if this passes, the
driver's hash compare should too.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact match required
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_INT = {"ByteType", "ShortType", "IntegerType", "LongType"}
_SPARK_FLT = {"FloatType", "DoubleType"}


def type_lint(spark_df, duck_rel) -> list[str]:
    """The driver's value hash is type-representation-sensitive. Flag the
    classes that round-trip differently between engines even when values
    agree: DECIMAL anywhere (r1: all 12 hash-fails), DuckDB HUGEINT —
    sum(BIGINT) promotes to int128, Spark has no int128 (r2: all 3
    hash-fails), and int-vs-float class clashes per shared column."""
    problems = []
    for f in spark_df.schema.fields:
        if "Decimal" in type(f.dataType).__name__:
            problems.append(f"spark DECIMAL output: {f.name}")
    smap = {f.name: type(f.dataType).__name__ for f in spark_df.schema.fields}
    for c, t in zip(duck_rel.columns, duck_rel.types):
        dt = str(t)
        if "DECIMAL" in dt:
            problems.append(f"oracle DECIMAL output: {c}")
        if "HUGEINT" in dt:
            problems.append(f"oracle HUGEINT output (CAST the sum to BIGINT): {c}")
        st = smap.get(c)
        if st and (
            (dt in _DUCK_INT and st in _SPARK_FLT)
            or (dt in ("DOUBLE", "FLOAT") and st in _SPARK_INT)
        ):
            problems.append(f"int/float class clash on {c}: spark={st} duck={dt}")
    return problems


def compare(spark_df, con, sql: str) -> dict:
    sp_rows = spark_df.collect()
    sp_cols = spark_df.columns
    duck = con.sql(sql)
    d_cols = duck.columns
    d_rows = duck.fetchall()

    report = {
        "type_lint": type_lint(spark_df, duck),
        "spark_rows": len(sp_rows),
        "duck_rows": len(d_rows),
        "rows_match": len(sp_rows) == len(d_rows),
        "cols_match": sorted(sp_cols) == sorted(d_cols),
        "spark_cols": sp_cols,
        "duck_cols": d_cols,
    }
    if report["rows_match"] and report["cols_match"]:
        a = _rowset(sp_cols, [tuple(r) for r in sp_rows])
        b = _rowset(d_cols, d_rows)
        report["values_match"] = a == b
        if not report["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            report["first_diffs"] = diffs[:3]
    else:
        report["values_match"] = False
    return report
