"""Round-12 contract queries: margin-based bitext mining
(operators/bitext.py, Artetxe & Schwenk 2019) — the exact all-pairs
baseline and the cluster-bucketed scale path over the embeddings
table, split into a deterministic src/tgt fixture by vec_id parity
(the two "languages"; the parity split is pure column arithmetic
identical in both engines, so the oracle value-checks the OPERATOR).

Oracle discipline: cosines via the bit-identical sequential-fold
double arithmetic, quantized once to BIGINT x1e12; ranks, order-free
neighborhood sums, the ratio margin, and the per-src best selection
are window CTEs replaying the operator's integer arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bitext import (
    BITEXT_K,
    BITEXT_MARGIN_MIN_X1E6,
    COSQ_SCALE,
    MARGIN_SCALE,
    bitext_mine,
    bitext_mine_ivf,
)
from ..sources.tables import load_table
from .llm_ops import _SQL_EMB_D

QUERIES: dict = {}
ORACLES: dict = {}

# centroid count scales with the corpus (k = max(8, ceil(n / TARGET)))
# so per-cluster populations stay bounded as data grows — the SemDeDup
# scale knob (queries/llm_ops.py SEMDEDUP_CLUSTER_TARGET); with fixed k
# the cluster-equi-joined pair count grows quadratically (the first x10
# probe measured exactly that: 32x wall / 87x shufW at k=8)
BITEXT_CLUSTER_TARGET = 250


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings")


def _sides(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    e = _emb(spark, sf)
    return (
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
    )


def q_bitext_mine(spark: SparkSession, sf: str) -> DataFrame:
    """Exact all-pairs margin mining (operators/bitext.py:bitext_mine):
    ratio margin over forward/backward 4-NN neighborhoods, per-src
    best candidate at margin >= 1.05 — the quadratic validation twin
    of the bucketed path."""
    src, tgt = _sides(spark, sf)
    return bitext_mine(src, tgt)


def q_bitext_mine_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-bucketed margin mining (bitext_mine_ivf): both sides
    assign to the shared first-8-vector centroid table (broadcast
    artifact), candidates and k-NN neighborhoods restrict to
    same-cluster pairs — work is sum_c |src_c|*|tgt_c|, the scale
    path."""
    src, tgt = _sides(spark, sf)
    e = _emb(spark, sf)
    k = max(8, -(-e.count() // BITEXT_CLUSTER_TARGET))
    centroids = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return bitext_mine_ivf(src, tgt, centroids)


_K = BITEXT_K
_MM = BITEXT_MARGIN_MIN_X1E6


def _sql_margin_core(pairs_cte: str) -> str:
    """The margin core as CTEs over ``pairs_cte`` (src_id, tgt_id,
    cos_q > 0), ending in the final SELECT."""
    return f"""
rk AS MATERIALIZED (
  SELECT src_id, tgt_id, cos_q,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY cos_q DESC, tgt_id ASC) AS frank,
         row_number() OVER (PARTITION BY tgt_id
                            ORDER BY cos_q DESC, src_id ASC) AS brank
  FROM {pairs_cte}
),
sm AS (
  SELECT src_id, tgt_id, cos_q, frank, brank,
         sum(CASE WHEN frank <= {_K} THEN cos_q END)
           OVER (PARTITION BY src_id) AS fsum,
         sum(CASE WHEN brank <= {_K} THEN cos_q END)
           OVER (PARTITION BY tgt_id) AS bsum
  FROM rk
),
cand AS (
  SELECT src_id, tgt_id, cos_q,
         CAST((cos_q * {2 * _K} * {MARGIN_SCALE})
              // greatest(fsum + bsum, 1) AS BIGINT) AS margin_x1e6
  FROM sm WHERE frank <= {_K} OR brank <= {_K}
)
SELECT src_id, tgt_id, cos_q AS cos_x1e12, margin_x1e6 FROM (
  SELECT cand.*,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY margin_x1e6 DESC, tgt_id ASC) AS mrank
  FROM cand
) WHERE mrank = 1 AND margin_x1e6 >= {_MM}
"""


_SQL_COSQ = (
    "CAST(floor(list_dot_product(sv, tv) / "
    "(sqrt(list_dot_product(sv, sv)) * sqrt(list_dot_product(tv, tv))) "
    f"* {COSQ_SCALE}) AS BIGINT)"
)

SQL_BITEXT_MINE = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 2 = 0),
t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 2 = 1),
pp AS MATERIALIZED (
  SELECT src_id, tgt_id, cos_q FROM (
    SELECT src_id, tgt_id, {_SQL_COSQ} AS cos_q FROM s, t
  ) WHERE cos_q > 0
),
{_sql_margin_core("pp")}
"""

SQL_BITEXT_MINE_IVF = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e
      WHERE vec_id < (SELECT greatest(8,
               CAST(ceil(count(*) / {BITEXT_CLUSTER_TARGET}.0) AS BIGINT))
             FROM embeddings)),
assign AS MATERIALIZED (
  SELECT e.vec_id,
         (min(struct_pack(
           d2 := list_sum(list_transform(generate_series(1, len(v)),
                                         i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           cid := c.centroid_id
         ))).cid AS cid
  FROM e CROSS JOIN c GROUP BY e.vec_id
),
s AS (SELECT e.vec_id AS src_id, e.v AS sv, a.cid
      FROM e JOIN assign a USING (vec_id) WHERE vec_id % 2 = 0),
t AS (SELECT e.vec_id AS tgt_id, e.v AS tv, a.cid
      FROM e JOIN assign a USING (vec_id) WHERE vec_id % 2 = 1),
pp AS MATERIALIZED (
  SELECT src_id, tgt_id, cos_q FROM (
    SELECT s.src_id, t.tgt_id, {_SQL_COSQ} AS cos_q
    FROM s JOIN t USING (cid)
  ) WHERE cos_q > 0
),
{_sql_margin_core("pp")}
"""


QUERIES.update(
    {
        "q_bitext_mine": q_bitext_mine,
        "q_bitext_mine_ivf": q_bitext_mine_ivf,
    }
)
ORACLES.update(
    {
        "q_bitext_mine": SQL_BITEXT_MINE,
        "q_bitext_mine_ivf": SQL_BITEXT_MINE_IVF,
    }
)
