"""Blocked fuzzy entity matching: edit-distance pair join without the
cartesian product.

The naive fuzzy join is O(n^2) levenshtein evaluations — at any real
scale the only viable shape is block -> pair within block -> verify,
the same candidate-then-verify discipline as the MinHash/LSH path
(operators/lsh.py). The block key bounds pair expansion: pairs are
O(sum over blocks of |block|^2), so the key must be chosen to keep
blocks small (first token at small scale; first-two-tokens, phonetic
codes, or length buckets as the corpus grows — it's a parameter, not a
code change).

Determinism: levenshtein is classic DP — identical integers on every
engine; pair orientation id_a < id_b makes each pair unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")[0]


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int,
) -> DataFrame:
    """Pairs (id_a, id_b, name_a, name_b, dist) with
    levenshtein(name_a, name_b) <= max_dist and both rows in the same
    block. One shuffle on the block key; the levenshtein verify runs
    post-join, JVM-side (whole-stage codegen), never on the full cross
    product."""
    a = df.select(
        block.alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = df.select(
        block.alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
