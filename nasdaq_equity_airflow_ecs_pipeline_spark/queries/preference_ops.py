"""Round-12 contract queries: Bradley-Terry preference fitting
(operators/preference.py) — the pairwise-preference estimator behind
reward-model data audits and arena-style rankings.

Fixture: a deterministic tournament over document SOURCES — each
consecutive doc pair (even doc_id vs doc_id+1) is one match, the doc
with more characters wins for its source (ties to the
lexicographically smaller source), same-source pairs are not matches.
The transform is pure column arithmetic implemented identically in
both engines (the WEBIFY precedent, queries/c4_ops.py), so the oracle
comparison value-checks the OPERATOR.

Oracle discipline: the 8 MM rounds are UNROLLED as CTEs over the pair
match matrix — per-round denominator sums, raw strengths, and the
normalization, every division a truncating integer div with the same
``greatest(.., 1)`` guards as the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.preference import BT_ROUNDS, BT_SCALE, bradley_terry
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _matches(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    a = d.filter(F.col("doc_id") % 2 == 0).alias("a")
    b = d.alias("b")
    j = a.join(b, F.expr("b.doc_id = a.doc_id + 1")).filter(
        F.expr("a.source <> b.source")
    )
    winner = F.expr(
        "CASE WHEN a.n_chars > b.n_chars THEN a.source "
        "WHEN a.n_chars < b.n_chars THEN b.source "
        "ELSE least(a.source, b.source) END"
    )
    loser = F.expr(
        "CASE WHEN a.n_chars > b.n_chars THEN b.source "
        "WHEN a.n_chars < b.n_chars THEN a.source "
        "ELSE greatest(a.source, b.source) END"
    )
    return j.select(winner.alias("winner"), loser.alias("loser"))


def q_bradley_terry(spark: SparkSession, sf: str) -> DataFrame:
    """Fit Bradley-Terry strengths over the source tournament
    (operators/preference.py:bradley_terry, Zermelo/MM fixed-point,
    8 unrolled integer rounds): (player, wins, games, p_x1e6, rank)."""
    return bradley_terry(_matches(spark, sf), rounds=BT_ROUNDS)


def _sql_bt() -> str:
    parts = [f"""
WITH m AS (
  SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source
              WHEN a.n_chars < b.n_chars THEN b.source
              ELSE least(a.source, b.source) END AS winner,
         CASE WHEN a.n_chars > b.n_chars THEN b.source
              WHEN a.n_chars < b.n_chars THEN a.source
              ELSE greatest(a.source, b.source) END AS loser
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 2 = 0 AND a.source <> b.source
),
mat AS MATERIALIZED (
  SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN winner = least(winner, loser)
                       THEN 1 ELSE 0 END) AS BIGINT) AS wi
  FROM m GROUP BY 1, 2
),
persp AS MATERIALIZED (
  SELECT i AS player, j AS opp, n FROM mat
  UNION ALL
  SELECT j AS player, i AS opp, n FROM mat
),
wins AS MATERIALIZED (
  SELECT winner AS player, CAST(count(*) AS BIGINT) AS w FROM m GROUP BY 1
),
pl AS MATERIALIZED (SELECT DISTINCT player FROM persp),
np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pl),
games AS (
  SELECT player, CAST(sum(n) AS BIGINT) AS games FROM persp GROUP BY 1
),
p0 AS MATERIALIZED (
  SELECT player, CAST({BT_SCALE} // greatest(np.np, 1) AS BIGINT) AS p
  FROM pl, np
)"""]
    for r in range(1, BT_ROUNDS + 1):
        parts.append(f""",
t{r} AS (
  SELECT pe.player,
         CAST(sum((pe.n * {BT_SCALE}) // greatest(pa.p + pb.p, 1))
              AS BIGINT) AS t
  FROM persp pe
  JOIN p{r - 1} pa ON pa.player = pe.player
  JOIN p{r - 1} pb ON pb.player = pe.opp
  GROUP BY 1
),
r{r} AS (
  SELECT t.player,
         CAST((COALESCE(w.w, 0) * {BT_SCALE}) // greatest(t.t, 1)
              AS BIGINT) AS praw
  FROM t{r} t LEFT JOIN wins w USING (player)
),
s{r} AS (SELECT CAST(greatest(sum(praw), 1) AS BIGINT) AS s FROM r{r}),
p{r} AS MATERIALIZED (
  SELECT player, CAST((praw * {BT_SCALE}) // sx.s AS BIGINT) AS p
  FROM r{r}, s{r} AS sx
)""")
    parts.append(f"""
SELECT pl.player, COALESCE(w.w, 0) AS wins, g.games,
       pf.p AS p_x1e6,
       CAST(row_number() OVER (ORDER BY pf.p DESC, pl.player ASC)
            AS BIGINT) AS rank
FROM pl
LEFT JOIN wins w ON w.player = pl.player
JOIN games g ON g.player = pl.player
JOIN p{BT_ROUNDS} pf ON pf.player = pl.player
""")
    return "".join(parts)


SQL_BRADLEY_TERRY = _sql_bt()


def q_bradley_terry_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental Bradley-Terry (operators/preference.py
    match_matrix_delta + bradley_terry_fit — the incremental-index
    discipline): the 80% standing match log publishes its pair-matrix
    artifact, the 20% delta batch folds in (the matrix is a monoid),
    and the refit must equal the full rebuild over the union EXACTLY —
    the oracle is the full-rebuild SQL verbatim."""
    from ..operators.preference import (
        bradley_terry_fit,
        match_matrix,
        match_matrix_delta,
    )

    m = _matches_with_id(spark, sf)
    standing = match_matrix(m.filter(F.col("mid") % 10 < 8))
    folded = match_matrix_delta(
        standing, m.filter(F.col("mid") % 10 >= 8)
    )
    return bradley_terry_fit(folded, rounds=BT_ROUNDS)


def _matches_with_id(spark: SparkSession, sf: str) -> DataFrame:
    """The tournament fixture keyed by the even doc id (the match id
    the standing/delta split cuts on)."""
    d = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    a = d.filter(F.col("doc_id") % 2 == 0).alias("a")
    b = d.alias("b")
    j = a.join(b, F.expr("b.doc_id = a.doc_id + 1")).filter(
        F.expr("a.source <> b.source")
    )
    winner = F.expr(
        "CASE WHEN a.n_chars > b.n_chars THEN a.source "
        "WHEN a.n_chars < b.n_chars THEN b.source "
        "ELSE least(a.source, b.source) END"
    )
    loser = F.expr(
        "CASE WHEN a.n_chars > b.n_chars THEN b.source "
        "WHEN a.n_chars < b.n_chars THEN a.source "
        "ELSE greatest(a.source, b.source) END"
    )
    return j.select(
        F.expr("a.doc_id div 2").alias("mid"),
        winner.alias("winner"),
        loser.alias("loser"),
    )


QUERIES.update(
    {
        "q_bradley_terry": q_bradley_terry,
        "q_bradley_terry_delta": q_bradley_terry_delta,
    }
)
ORACLES.update(
    {
        "q_bradley_terry": SQL_BRADLEY_TERRY,
        # fold == rebuild exactly (the matrix is a monoid), so the
        # oracle is the full-rebuild statement verbatim
        "q_bradley_terry_delta": SQL_BRADLEY_TERRY,
    }
)
