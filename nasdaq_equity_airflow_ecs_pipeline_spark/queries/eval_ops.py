"""Round-12 contract queries: eval-harness metrics
(operators/evalmetrics.py) — SQuAD normalized token F1 / exact match
and ROUGE-L over (prediction, reference) pairs.

Fixture: deterministic predictions derived from the documents table —
every token at 0-based position ``pos % 7 == doc_id % 7`` is dropped
(a doc-varying deletion noise model), except ``doc_id % 5 == 0``
where the prediction is the reference verbatim (the exact-match
subset). Pure column arithmetic, implemented identically in both
engines (the WEBIFY precedent), so the oracle value-checks the
OPERATOR.

Oracle discipline: SQuAD normalization mirrored term for term;
multiset overlap via a full-outer token-count join; the ROUGE-L LCS
DP replayed with nested list_reduce using the seed-element trick
(DuckDB's list_reduce has no initial-value form — the accumulator
seeds from a prepended init element of the same type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.evalmetrics import (
    ARTICLES,
    EVAL_SCALE,
    rouge_l,
    token_f1,
)
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = F.expr(r"filter(split(trim(text), '\\s+'), x -> x != '')")
    pred = F.expr(
        "CASE WHEN size(_t) = 0 THEN '' ELSE array_join(transform("
        "filter(sequence(1, size(_t)), i -> (i - 1) % 7 != doc_id % 7), "
        "i -> element_at(_t, i)), ' ') END"
    )
    return d.withColumn("_t", toks).select(
        F.col("doc_id").alias("pair_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .otherwise(pred)
        .alias("prediction"),
        F.col("text").alias("reference"),
    )


def q_eval_f1(spark: SparkSession, sf: str) -> DataFrame:
    """SQuAD-official normalized token F1 + exact match
    (operators/evalmetrics.py:token_f1): multiset overlap at x1e6
    fixed point over the deletion-noise prediction fixture."""
    return token_f1(_pairs(spark, sf))


def q_eval_rouge_l(spark: SparkSession, sf: str) -> DataFrame:
    """ROUGE-L (operators/evalmetrics.py:rouge_l): true LCS via the
    in-engine row-rolling DP fold, beta=1 F at x1e6 fixed point."""
    return rouge_l(_pairs(spark, sf))


_ARTS = ", ".join(f"'{a}'" for a in ARTICLES)

_SQL_PAIRS = r"""
pt AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x != '') AS tt
  FROM documents
),
pairs AS (
  SELECT doc_id AS pair_id,
         CASE WHEN doc_id % 5 = 0 THEN text
              WHEN len(tt) = 0 THEN ''
              ELSE array_to_string(list_transform(
                     list_filter(generate_series(1, len(tt)),
                                 i -> (i - 1) % 7 != doc_id % 7),
                     i -> tt[i]), ' ') END AS prediction,
         text AS reference
  FROM pt
)"""


def _sql_norm(col: str) -> str:
    return (
        f"list_filter(string_split(trim(regexp_replace(lower({col}), "
        f"'[^a-z0-9]+', ' ', 'g')), ' '), "
        f"tok -> tok != '' AND tok NOT IN ({_ARTS}))"
    )


SQL_EVAL_F1 = f"""
WITH {_SQL_PAIRS.lstrip()},
base AS MATERIALIZED (
  SELECT pair_id, {_sql_norm("prediction")} AS p,
         {_sql_norm("reference")} AS r
  FROM pairs
),
pc AS (
  SELECT pair_id, tok, CAST(count(*) AS BIGINT) AS cp
  FROM base, unnest(p) AS u(tok) GROUP BY 1, 2
),
rc AS (
  SELECT pair_id, tok, CAST(count(*) AS BIGINT) AS cr
  FROM base, unnest(r) AS u(tok) GROUP BY 1, 2
),
ov AS (
  SELECT pair_id,
         CAST(sum(least(coalesce(cp, 0), coalesce(cr, 0))) AS BIGINT)
           AS n_overlap
  FROM pc FULL OUTER JOIN rc USING (pair_id, tok) GROUP BY 1
)
SELECT b.pair_id,
       CAST(len(p) AS BIGINT) AS n_pred,
       CAST(len(r) AS BIGINT) AS n_ref,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN p = r THEN 1 ELSE 0 END AS INT) AS em,
       CAST(CASE WHEN len(p) + len(r) = 0 THEN {EVAL_SCALE}
                 ELSE (2 * coalesce(ov.n_overlap, 0) * {EVAL_SCALE})
                      // (len(p) + len(r)) END AS BIGINT) AS f1_x1e6
FROM base b LEFT JOIN ov USING (pair_id)
"""

SQL_EVAL_ROUGE_L = f"""
WITH {_SQL_PAIRS.lstrip()},
base AS (
  SELECT pair_id, {_sql_norm("prediction")} AS p,
         {_sql_norm("reference")} AS r
  FROM pairs
),
dp AS (
  SELECT pair_id, p, r,
         CASE WHEN len(p) = 0 OR len(r) = 0 THEN 0
              ELSE list_reduce(
           [list_transform(generate_series(0, len(r)), x -> 0)] ||
           list_transform(generate_series(1, len(p)), i -> [i]),
           (prev, xi) -> list_reduce(
               [[0]] || list_transform(generate_series(1, len(r)), j -> [j]),
               (acc, xj) -> acc || [greatest(
                   prev[xj[1] + 1], acc[xj[1]],
                   prev[xj[1]] + CASE WHEN p[xi[1]] = r[xj[1]]
                                      THEN 1 ELSE 0 END)])
         )[-1] END AS lcs
  FROM base
)
SELECT pair_id,
       CAST(len(p) AS BIGINT) AS n_pred,
       CAST(len(r) AS BIGINT) AS n_ref,
       CAST(lcs AS BIGINT) AS lcs,
       CAST(CASE WHEN len(p) + len(r) = 0 THEN {EVAL_SCALE}
                 ELSE (2 * lcs * {EVAL_SCALE}) // (len(p) + len(r))
            END AS BIGINT) AS rouge_l_f_x1e6
FROM dp
"""


QUERIES.update(
    {
        "q_eval_f1": q_eval_f1,
        "q_eval_rouge_l": q_eval_rouge_l,
    }
)
ORACLES.update(
    {
        "q_eval_f1": SQL_EVAL_F1,
        "q_eval_rouge_l": SQL_EVAL_ROUGE_L,
    }
)
