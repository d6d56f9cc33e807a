"""Advanced analytics queries: funnel analysis, deterministic distinct
sketches, substring-level dedup, and fixed-point PageRank.

Everything here extends the engine beyond the reference surface (the
reference is a daily-OHLCV ETL with no per-event, sketch, or graph
analytics — see /root/reference/glue/jobs/transform_stock_data.py for
its whole computational vocabulary) while keeping the repo's exactness
discipline: every query is bit-reproducible on any partitioning and has
an independent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import kmv_distinct
from ..operators.funnel import funnel_stages
from ..operators.pagerank import co_order_edges, pagerank_fixed_point
from ..operators.text import substring_dup_stats
from ..sources.tables import load_table


# ----------------------------------------------------------- event funnel
FUNNEL_STEPS = ["view", "click", "purchase"]


def q_event_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel per user: earliest
    strictly-increasing completion time of each step and the stage
    reached. One hash-agg per step keyed on user_id (operators/funnel.py
    — O(steps) state per user, no row buffering)."""
    ev = load_table(spark, sf, "events")
    return funnel_stages(ev, FUNNEL_STEPS).select(
        "user_id", "t1", "t2", "t3", "stage"
    )


SQL_EVENT_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT s1.user_id, t1, min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
  GROUP BY 1, 2
),
s3 AS (
  SELECT s2.user_id, t1, t2,
         min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
  GROUP BY 1, 2, 3
)
SELECT user_id, t1, t2, t3,
       CAST(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
FROM s3
"""


# ------------------------------------------------- KMV distinct sketch
KMV_K = 64
_KMV_SPACE_INT = 1 << 60


def q_distinct_kmv(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic distinct-count sketch: K-minimum-values estimate of
    distinct customers per order priority, next to the exact count so
    the sketch error is visible. KMV over a portable md5 hash is the
    oracle-checkable stand-in for HLL (functions/sketches.py) — same
    single-pass mergeable shape, exact cross-engine reproducibility."""
    orders = load_table(spark, sf, "orders")
    est = kmv_distinct(orders, ["o_orderpriority"], "o_custkey", k=KMV_K)
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority", "distinct_est", "exact_distinct"
    )


SQL_DISTINCT_KMV = f"""
WITH h AS (
  SELECT DISTINCT o_orderpriority AS grp,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM orders
),
r AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM h
),
k AS (
  SELECT grp, count(*) AS n_kept, max(h) AS h_k
  FROM r WHERE rn <= {KMV_K} GROUP BY 1
),
x AS (
  SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS exact_distinct
  FROM orders GROUP BY 1
)
SELECT k.grp AS o_orderpriority,
       CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE)
                 / (CAST(h_k AS DOUBLE) / CAST({_KMV_SPACE_INT} AS DOUBLE))
       END AS distinct_est,
       exact_distinct
FROM k JOIN x ON k.grp = x.grp
"""


# ------------------------------------------------- substring-window dedup
SUB_WINDOW = 64
SUB_STRIDE = 32


def q_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Character-window substring dedup over documents (Lee et al. 2022
    re-expressed for hash-aggregation, operators/text.py
    substring_dup_stats): fraction of each doc's 64-char windows that
    also occur verbatim in another document."""
    docs = load_table(spark, sf, "documents")
    return substring_dup_stats(
        docs, window=SUB_WINDOW, stride=SUB_STRIDE
    )


SQL_SUBSTRING_DEDUP = f"""
WITH wins AS (
  SELECT doc_id, md5(substr(text, CAST(i AS INT), {SUB_WINDOW})) AS wh
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - {SUB_WINDOW - 1},
                                  {SUB_STRIDE})) AS i
    FROM documents WHERE length(text) >= {SUB_WINDOW}
  )
),
dup AS (
  SELECT wh FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) >= 2
),
per AS (
  SELECT w.doc_id, count(*) AS n_windows,
         CAST(sum(CASE WHEN d.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows
  FROM wins w LEFT JOIN dup d ON w.wh = d.wh
  GROUP BY 1
)
SELECT doc.doc_id,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN COALESCE(n_windows, 0) > 0
            THEN CAST(n_dup_windows AS DOUBLE) / n_windows
            ELSE 0.0 END AS dup_frac
FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
"""


# ------------------------------------------------- fixed-point PageRank
PR_ITERS = 3
PR_SCALE = 1_000_000_000_000


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration PageRank over the co-order part graph in 10^-12
    fixed-point integer arithmetic (operators/pagerank.py) — exact,
    engine- and partitioning-independent; the oracle unrolls the same
    three rounds as CTEs with DuckDB integer division."""
    li = load_table(spark, sf, "lineitem")
    return pagerank_fixed_point(co_order_edges(li), iters=PR_ITERS)


def _sql_pagerank() -> str:
    s = PR_SCALE
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
c{i} AS (
  SELECT e.dst AS node, sum(r.rank // r.deg) AS in_sum
  FROM edges e JOIN {prev} r ON e.src = r.node GROUP BY 1
),
r{i} AS (
  SELECT p.node, p.deg, p.n,
         CAST((3 * {s}) // (20 * p.n)
              + (17 * COALESCE(c.in_sum, 0)) // 20 AS BIGINT) AS rank
  FROM {prev} p LEFT JOIN c{i} c ON p.node = c.node
)""")
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey != b.l_partkey
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT src AS node, deg, n, {s} // n AS rank FROM deg, nn
),{",".join(rounds)}
SELECT node, rank AS rank_scaled FROM {prev}
"""


SQL_PAGERANK = _sql_pagerank()


QUERIES = {
    "q_event_funnel": q_event_funnel,
    "q_distinct_kmv": q_distinct_kmv,
    "q_substring_dedup": q_substring_dedup,
    "q_pagerank": q_pagerank,
}

ORACLES = {
    "q_event_funnel": SQL_EVENT_FUNNEL,
    "q_distinct_kmv": SQL_DISTINCT_KMV,
    "q_substring_dedup": SQL_SUBSTRING_DEDUP,
    "q_pagerank": SQL_PAGERANK,
}
