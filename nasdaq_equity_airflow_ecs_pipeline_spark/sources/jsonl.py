"""Raw JSONL partition source/sink (reference S1/K1).

The reference reads one day with a hand-built path
``s3://…/raw/stock_quotes/date={d}/`` (glue/jobs/build_stock_fact_table.py:28-32)
and the Lambda writes newline-delimited JSON under the same Hive-style key
(lambda/stock_extractor/lambda_function.py:158-197). We keep Hive-style
``date=`` directories but read through the partitioned-table path with a
``WHERE`` on the partition column, so Catalyst partition pruning replaces
string interpolation — same I/O, but composable with multi-day reads and
safe under predicate pushdown at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_QUOTE_SCHEMA


def read_quotes_jsonl(
    spark: SparkSession, root: str, processing_date: str | None = None
) -> DataFrame:
    """Read the raw quote feed; explicit schema (no inference pass).

    ``root`` holds Hive-style ``date=YYYY-MM-DD/`` subdirs. With
    ``processing_date`` the filter prunes to that partition only.
    """
    df = (
        spark.read.schema(RAW_QUOTE_SCHEMA)
        .option("basePath", root)
        .json(f"{root}/date=*")
    )
    if processing_date is not None:
        df = df.where(F.col("date") == processing_date)
    return df


def write_quotes_jsonl(df: DataFrame, root: str, mode: str = "append") -> None:
    """Append quotes into ``date=`` partition dirs (parity with Lambda K1)."""
    cols = df.columns
    if "date" not in cols:
        raise ValueError("quotes frame must carry a 'date' partition column")
    df.write.mode(mode).partitionBy("date").json(root)
