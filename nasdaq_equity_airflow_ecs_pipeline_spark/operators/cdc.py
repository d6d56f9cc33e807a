"""Change-data-capture: keyed diff between two table snapshots.

Complements operators/versioned.py (snapshots, time travel): given two
snapshots of a keyed table, emit the change set — ``insert`` (key only in
new), ``delete`` (key only in old), ``update`` (key in both, payload
differs). This is the diff a MERGE-based pipeline (reference upsert,
glue/jobs/build_stock_fact_table.py:104-111) consumes or emits.

Spark-first plan: a single full-outer equi join on the key — one shuffle
per side (or zero with co-bucketed snapshots, sources/bucketed.py), then
null-safe column comparison, all inside whole-stage codegen. Unchanged
rows are dropped immediately after the join, so the change set —
typically ≪ snapshot size — is all that flows downstream. For very wide
payloads, pre-hashing the tracked columns with ``xxhash64`` on each side
before the join trades N column comparisons for one 64-bit compare; with
the handful of columns typical here, direct comparison is cheaper and
collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    payload: list[str],
) -> DataFrame:
    """Diff two snapshots; returns ``key, change, old_…/new_… payload``.

    ``change`` ∈ {'insert','delete','update'}; unchanged keys are omitted.
    Null payload values compare null-safely (null == null is unchanged).
    """
    o = old.select(
        F.col(key).alias("__k"),
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in payload],
    )
    n = new.select(
        F.col(key).alias("__k"),
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in payload],
    )
    j = o.join(n, "__k", "full_outer")
    # Seeding with True makes an empty payload degrade to key-presence
    # diffing (insert/delete only) instead of `~None` raising at plan time.
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "insert")
        .when(F.col("__in_new").isNull(), "delete")
        .when(~same, "update")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .withColumnRenamed("__k", key)
        .drop("__in_old", "__in_new")
    )


def apply_changes(base: DataFrame, changes: DataFrame, key: str, payload: list[str]) -> DataFrame:
    """Re-apply a ``snapshot_diff`` change set to the old snapshot — the
    inverse operation, proving the diff is lossless: ``apply_changes(old,
    diff(old,new)) ≡ new``. Anti-join removes deleted/updated keys, union
    adds inserted/updated rows — same anti-join+union shape as the CoW
    MERGE (operators/upsert.py), one shuffle each."""
    dead = changes.filter(F.col("change").isin("delete", "update")).select(
        F.col(key)
    )
    incoming = changes.filter(F.col("change").isin("insert", "update")).select(
        F.col(key), *[F.col(f"new_{c}").alias(c) for c in payload]
    )
    kept = base.select(key, *payload).join(dead, key, "left_anti")
    return kept.unionByName(incoming)
