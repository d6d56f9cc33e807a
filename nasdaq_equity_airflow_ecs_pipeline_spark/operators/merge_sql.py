"""SQL front for keyed MERGE — the reference's literal API.

The reference upserts with Iceberg ``MERGE INTO`` SQL text
(glue/jobs/build_stock_fact_table.py:104-111):

    MERGE INTO {table} t
    USING new_fact_data s
    ON t.stock_symbol = s.stock_symbol AND t.trade_date = s.trade_date
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

Without an Iceberg/Delta catalog, plain ``spark.sql`` cannot execute
MERGE; this module accepts the same statement shape, compiles it onto
``operators.upsert.merge_upsert`` (anti-join + union — the join MERGE
compiles to internally anyway), and swaps the merged result back in as
the target temp view. A user of the reference can paste their MERGE
statement unchanged.

Restrictions (= exactly the subset the reference uses): equality key
conjunction in ON, ``WHEN MATCHED THEN UPDATE SET *``, ``WHEN NOT
MATCHED THEN INSERT *``. Anything else raises rather than silently
diverging from Iceberg semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .upsert import merge_upsert

_MERGE_RE = re.compile(
    r"""
    MERGE\s+INTO\s+(?P<target>[\w.]+)\s+(?:AS\s+)?(?P<talias>\w+)\s+
    USING\s+(?P<source>[\w.]+)\s+(?:AS\s+)?(?P<salias>\w+)\s+
    ON\s+(?P<on>.+?)\s+
    WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+
    WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")


def parse_merge(sql: str) -> tuple[str, str, list[str]]:
    """-> (target_view, source_view, key_columns). Raises ValueError on
    anything outside the supported MERGE subset."""
    m = _MERGE_RE.match(sql.strip())
    if not m:
        raise ValueError(
            "unsupported MERGE statement; expected: MERGE INTO <t> t "
            "USING <s> s ON t.k = s.k [AND ...] WHEN MATCHED THEN UPDATE "
            "SET * WHEN NOT MATCHED THEN INSERT *"
        )
    talias, salias = m.group("talias"), m.group("salias")
    keys: list[str] = []
    for clause in re.split(r"\s+AND\s+", m.group("on"), flags=re.IGNORECASE):
        eq = _EQ_RE.match(clause)
        if not eq:
            raise ValueError(f"unsupported ON clause term: {clause!r}")
        a_al, a_col, b_al, b_col = eq.groups()
        pair = {a_al: a_col, b_al: b_col}
        if set(pair) != {talias, salias} or pair[talias] != pair[salias]:
            raise ValueError(
                f"ON term must equate the same column across target and "
                f"source aliases: {clause!r}"
            )
        keys.append(pair[talias])
    return m.group("target"), m.group("source"), keys


def merge_into(spark: SparkSession, sql: str) -> DataFrame:
    """Execute a reference-shaped MERGE INTO over temp views; the merged
    result replaces the target view (CoW table semantics) and is
    returned."""
    target_name, source_name, keys = parse_merge(sql)
    target = spark.table(target_name)
    source = spark.table(source_name)
    merged = merge_upsert(target, source, keys)
    merged.createOrReplaceTempView(target_name.replace(".", "_"))
    return merged
