"""Advanced analytics queries: funnel analysis, deterministic distinct
sketches, substring-level dedup, and fixed-point PageRank.

Everything here extends the engine beyond the reference surface (the
reference is a daily-OHLCV ETL with no per-event, sketch, or graph
analytics — see /root/reference/glue/jobs/build_stock_dimensions.py,
build_stock_fact_table.py and build_stock_aggregations.py for its whole
computational vocabulary) while keeping the repo's exactness
discipline: every query is bit-reproducible on any partitioning and has
an independent DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import kmv_distinct
from ..functions.stable import sql_davg, sql_dcorr, sql_dec2dbl
from ..operators.funnel import funnel_stages
from ..operators.pagerank import co_order_edges, pagerank_fixed_point
from ..operators.text import (
    cdc_dedup_apply,
    substring_dedup_apply,
    substring_dup_stats,
    substring_index_delta,
    substring_kept_chunks,
)
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


# -------------------------------------------- deterministic HLL sketch
def q_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog distinct customers per order priority
    (functions/sketches.py:hll_distinct): integer register math over
    the portable md5 hash, raw estimator, exact count alongside so the
    sketch error is visible. Unlike approx_count_distinct (HLL++,
    implementation-defined), this is bit-identical cross-engine."""
    from ..functions.sketches import hll_distinct

    orders = load_table(spark, sf, "orders")
    est = hll_distinct(orders, ["o_orderpriority"], "o_custkey")
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority", "distinct_est", "n_buckets", "exact_distinct"
    )


def _sql_hll() -> str:
    from ..functions.sketches import HLL_M, HLL_NUM, HLL_RHO_MAX

    return f"""
WITH h AS (
  SELECT o_orderpriority AS grp,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM orders
),
b AS (
  SELECT grp, h % {HLL_M} AS bucket,
         CASE WHEN (h // {HLL_M}) = 0 THEN {HLL_RHO_MAX}
              ELSE {HLL_RHO_MAX} - length(bin(h // {HLL_M})) END AS rho
  FROM h
),
regs AS (SELECT grp, bucket, MAX(rho) AS m_j FROM b GROUP BY 1, 2),
per AS (
  SELECT grp,
         SUM(1::BIGINT << ({HLL_RHO_MAX} - m_j)) AS sum_obs,
         count(*) AS n_buckets
  FROM regs GROUP BY 1
),
x AS (SELECT o_orderpriority AS grp,
             count(DISTINCT o_custkey) AS exact_distinct
      FROM orders GROUP BY 1)
SELECT per.grp AS o_orderpriority,
       {HLL_NUM!r}
         / CAST(sum_obs + ({HLL_M} - n_buckets) * (1::BIGINT << {HLL_RHO_MAX})
                AS DOUBLE) AS distinct_est,
       n_buckets, exact_distinct
FROM per JOIN x ON per.grp = x.grp
"""


SQL_HLL_DISTINCT = _sql_hll()


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


def q_substring_dedup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """APPLY substring dedup (operators/text.py:substring_dedup_apply —
    Lee et al. 2022's remove step, not just the report): delete all but
    the canonical first occurrence of every duplicated 64-char aligned
    chunk and reassemble each document order-preservingly; sub-window
    tails pass through."""
    docs = load_table(spark, sf, "documents")
    return substring_dedup_apply(docs, window=SUB_WINDOW)


SQL_SUBSTRING_DEDUP_APPLY = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(floor(length(text) * 1.0 / {SUB_WINDOW}) AS BIGINT) AS n_full
  FROM documents
),
ch AS (
  SELECT doc_id, CAST(j AS BIGINT) AS idx,
         substring(text, CAST((j - 1) * {SUB_WINDOW} + 1 AS INT),
                   {SUB_WINDOW}) AS chunk
  FROM base, unnest(generate_series(1, n_full)) AS u(j)
),
keep AS (
  SELECT doc_id, idx, chunk FROM (
    SELECT doc_id, idx, chunk,
           row_number() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, idx) AS rn
    FROM ch
  ) WHERE rn = 1
),
reb AS (
  SELECT doc_id, string_agg(chunk, '' ORDER BY idx) AS body,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM keep GROUP BY 1
)
SELECT b.doc_id,
       coalesce(r.body, '')
         || substring(b.text, CAST(b.n_full * {SUB_WINDOW} + 1 AS INT))
         AS kept_text,
       b.n_full AS n_chunks,
       CAST(b.n_full - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN reb r USING (doc_id)
"""


def q_substring_index_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental substring-dedup maintenance == full rebuild, pinned
    by the oracle (operators/text.py:substring_index_delta): the
    standing 80%-by-id corpus's KEPT-chunk index folds with the newest
    20% of doc ids (append-only monotone ids — the contract's
    precondition), delta chunks owned by the standing index are
    removed via one hash-keyed anti-join, and the delta result must
    equal the full-corpus substring_dedup_apply restricted to delta
    ids."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    mx = int(docs.agg(F.max("doc_id")).collect()[0][0])  # 1-row bound
    thr = mx * 4 // 5
    standing_docs = docs.filter(F.col("doc_id") <= thr)
    delta_docs = docs.filter(F.col("doc_id") > thr)
    standing_chunks = substring_kept_chunks(standing_docs, window=SUB_WINDOW)
    _folded, result = substring_index_delta(
        standing_chunks, delta_docs, window=SUB_WINDOW
    )
    return result


SQL_SUBSTRING_INDEX_DELTA = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(floor(length(text) * 1.0 / {SUB_WINDOW}) AS BIGINT) AS n_full
  FROM documents
),
thr AS (SELECT max(doc_id) * 4 // 5 AS t FROM base),
ch AS (
  SELECT doc_id, CAST(j AS BIGINT) AS idx,
         substring(text, CAST((j - 1) * {SUB_WINDOW} + 1 AS INT),
                   {SUB_WINDOW}) AS chunk
  FROM base, unnest(generate_series(1, n_full)) AS u(j)
),
keep AS (
  SELECT doc_id, idx, chunk FROM (
    SELECT doc_id, idx, chunk,
           row_number() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, idx) AS rn
    FROM ch
  ) WHERE rn = 1
),
reb AS (
  SELECT doc_id, string_agg(chunk, '' ORDER BY idx) AS body,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM keep GROUP BY 1
)
SELECT b.doc_id,
       coalesce(r.body, '')
         || substring(b.text, CAST(b.n_full * {SUB_WINDOW} + 1 AS INT))
         AS kept_text,
       b.n_full AS n_chunks,
       CAST(b.n_full - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN reb r USING (doc_id) CROSS JOIN thr
WHERE b.doc_id > thr.t
"""


CDC_M = 16


def q_cdc_dedup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined-chunking dedup APPLY (operators/text.py:
    cdc_dedup_apply — LBFS/FastCDC boundaries over tokens): chunk
    boundaries fall where a token's content hash is 0 mod 16, so
    duplicated runs dedup at ANY document offset — closing the
    alignment sensitivity of the fixed-tiling q_substring_dedup_apply.
    Canonical first copy survives; documents reassemble
    order-preservingly from surviving chunks."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return cdc_dedup_apply(docs, m=CDC_M)


SQL_CDC_DEDUP_APPLY = rf"""
WITH toks AS (
  SELECT doc_id, u.i AS pos, t[u.i] AS tok
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
       unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
flagged AS (
  SELECT doc_id, pos, tok,
         CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647)
                   % {CDC_M} = 0 THEN 1 ELSE 0 END AS flag
  FROM toks
),
wc AS (
  SELECT doc_id, pos, tok,
         CAST(coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS chunk_id
  FROM flagged
),
ch AS (
  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM wc GROUP BY 1, 2
),
keep AS (
  SELECT doc_id, chunk_id, chunk FROM (
    SELECT doc_id, chunk_id, chunk,
           row_number() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, chunk_id) AS rn
    FROM ch
  ) WHERE rn = 1
),
reb AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_id) AS body,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM keep GROUP BY 1
),
tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY 1
)
SELECT d.doc_id,
       coalesce(r.body, '') AS kept_text,
       coalesce(t.n_chunks, 0) AS n_chunks,
       CAST(coalesce(t.n_chunks, 0) - coalesce(r.n_kept, 0) AS BIGINT)
         AS n_removed
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN reb r USING (doc_id)
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


# ------------------------------------------- triangles / clustering coeff
def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient on the
    co-order part graph (operators/graph.py triangle_stats — canonical
    a<b<c orientation finds each triangle exactly once with two hash
    joins, no division fix-ups)."""
    from ..operators.graph import triangle_stats

    li = load_table(spark, sf, "lineitem")
    return triangle_stats(co_order_edges(li))


SQL_TRIANGLE_COUNT = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey != b.l_partkey
),
canon AS (SELECT src, dst FROM edges WHERE src < dst),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
tris AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM canon e1
  JOIN canon e2 ON e1.dst = e2.src
  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS node FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris
),
tc AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY 1)
SELECT d.node, d.deg,
       COALESCE(n_tri, 0) AS n_tri,
       CASE WHEN d.deg > 1
            THEN 2.0 * CAST(COALESCE(n_tri, 0) AS DOUBLE)
                 / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0))
            ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN tc ON d.node = tc.node
"""


# ----------------------------------------------------- window rank family
def q_window_ranks(spark: SparkSession, sf: str) -> DataFrame:
    """The full SQL window-rank surface in one query: rank / dense_rank /
    percent_rank / cume_dist on the VALUE ordering (ties share ranks —
    deterministic because rank depends only on the key, not row order)
    and row_number / ntile on a fully-tiebroken ordering (ties would
    otherwise make both engine-dependent)."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    wv = Window.partitionBy("l_returnflag").orderBy(F.asc("l_quantity"))
    wu = Window.partitionBy("l_returnflag").orderBy(
        F.asc("l_quantity"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.rank().over(wv).alias("rnk"),
        F.dense_rank().over(wv).alias("drnk"),
        F.percent_rank().over(wv).alias("prnk"),
        F.cume_dist().over(wv).alias("cdist"),
        F.row_number().over(wu).alias("rn"),
        F.ntile(4).over(wu).alias("quartile"),
    )


SQL_WINDOW_RANKS = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       rank() OVER wv AS rnk,
       dense_rank() OVER wv AS drnk,
       percent_rank() OVER wv AS prnk,
       cume_dist() OVER wv AS cdist,
       row_number() OVER wu AS rn,
       ntile(4) OVER wu AS quartile
FROM lineitem
WINDOW wv AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC),
       wu AS (PARTITION BY l_returnflag
              ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC)
"""


# ------------------------------------------------- fuzzy entity matching
FUZZY_MAX_DIST = 2


def q_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked edit-distance entity matching over part names
    (operators/fuzzy.py): candidate pairs share the trailing token
    (the category noun), verified with JVM-side levenshtein — the
    candidate/verify shape of LSH applied to string identity."""
    from ..operators.fuzzy import fuzzy_match_pairs

    part = load_table(spark, sf, "part")
    blk = F.element_at(F.split(F.col("p_name"), " "), -1)
    return fuzzy_match_pairs(
        part, "p_partkey", "p_name", blk, max_dist=FUZZY_MAX_DIST
    )


SQL_FUZZY_MATCH = f"""
WITH p AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', -1) AS blk FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


# ------------------------------------------- incremental agg maintenance
def q_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/incremental.py):
    events arrive as three disjoint batches (day-of-month mod 3);
    each batch becomes a mergeable partial, the partials fold together,
    and the finalized view must equal the one-shot full aggregate the
    oracle computes — proving merge associativity at the bit level."""
    from ..operators.incremental import (
        finalize_rollup,
        merge_partials,
        partial_rollup,
    )

    ev = load_table(spark, sf, "events")
    batches = [
        partial_rollup(
            ev.filter(F.dayofmonth("ts") % 3 == i), ["event_type"], "value"
        )
        for i in range(3)
    ]
    return finalize_rollup(merge_partials(*batches))


SQL_INCREMENTAL_ROLLUP = f"""
SELECT event_type,
       count(*) AS n,
       {sql_dec2dbl("sum(CAST(value AS DECIMAL(38,6)))")} AS sum_v,
       ({sql_dec2dbl("sum(CAST(value AS DECIMAL(38,6)))")})
         / CAST(count(*) AS DOUBLE) AS avg_v,
       min(value) AS min_v,
       max(value) AS max_v
FROM events GROUP BY 1
"""


# ---------------------------------------------------- SCD2 dim history
def q_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 dimension build (operators/scd2.py): collapse each user's
    event_type change log into validity intervals [valid_from, valid_to)
    with version numbers and an is_current flag — gaps-and-islands over
    one key-partitioned shuffle; the oracle is the same relational
    formulation in DuckDB window SQL."""
    from ..operators.scd2 import scd2_build

    ev = load_table(spark, sf, "events")
    return scd2_build(
        ev, key="user_id", attrs=["event_type"],
        ts_col="ts", order_tiebreak="event_id",
    ).select(
        "user_id", "event_type", "version", "valid_from", "valid_to",
        "is_current", "n_events",
    )


SQL_SCD2_HISTORY = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN row_number() OVER w = 1 THEN 1
              WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1
              ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM ordered
),
vers AS (
  SELECT user_id, version, event_type,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, event_type, CAST(version AS BIGINT) AS version, valid_from,
       lead(valid_from) OVER wv AS valid_to,
       (lead(valid_from) OVER wv IS NULL) AS is_current,
       n_events
FROM vers
WINDOW wv AS (PARTITION BY user_id ORDER BY version ASC)
"""


# ------------------------------------------------- CDC snapshot diff
def q_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """CDC between two snapshots (operators/cdc.py): new snapshot derives
    deterministically from customer (delete key%97=0, re-balance key%13=0,
    insert key%101=0 clones at key+1000000); the diff is one full-outer
    join + null-safe payload compare, emitting insert/delete/update rows
    only."""
    from ..operators.cdc import snapshot_diff

    cust = load_table(spark, sf, "customer")
    k = F.col("c_custkey")
    old = cust.select("c_custkey", "c_name", "c_acctbal")
    new = (
        old.filter(~(k % 97 == 0))
        .withColumn(
            "c_acctbal",
            F.when(k % 13 == 0, F.col("c_acctbal") + 10.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            old.filter(k % 101 == 0).select(
                (k + 1000000).alias("c_custkey"),
                F.concat(F.col("c_name"), F.lit("_clone")).alias("c_name"),
                "c_acctbal",
            )
        )
    )
    return snapshot_diff(old, new, key="c_custkey",
                         payload=["c_name", "c_acctbal"])


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer
),
new AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS c_acctbal
  FROM old WHERE NOT (c_custkey % 97 = 0)
  UNION ALL
  SELECT c_custkey + 1000000, c_name || '_clone', c_acctbal
  FROM old WHERE c_custkey % 101 = 0
),
j AS (
  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
         o.c_custkey IS NOT NULL AS in_old,
         n.c_custkey IS NOT NULL AS in_new,
         o.c_name AS old_c_name, o.c_acctbal AS old_c_acctbal,
         n.c_name AS new_c_name, n.c_acctbal AS new_c_acctbal
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT c_custkey, old_c_name, old_c_acctbal, new_c_name, new_c_acctbal,
       CASE WHEN NOT in_old THEN 'insert'
            WHEN NOT in_new THEN 'delete'
            WHEN old_c_name IS DISTINCT FROM new_c_name
              OR old_c_acctbal IS DISTINCT FROM new_c_acctbal THEN 'update'
       END AS change
FROM j
WHERE (NOT in_old) OR (NOT in_new)
   OR old_c_name IS DISTINCT FROM new_c_name
   OR old_c_acctbal IS DISTINCT FROM new_c_acctbal
"""


# ------------------------------------------- bloom semi-join reduction
def q_bloom_prune_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered semi join (operators/bloom.py): orders restricted
    to BUILDING-segment customers. The relational Bloom filter prunes the
    probe side before the exact semi join's shuffle; the final result is
    exact, so the oracle is the plain semi join."""
    from ..functions.stable import dsum
    from ..operators.bloom import bloom_semi_join

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    hits = bloom_semi_join(
        orders, cust, probe_key="o_custkey", build_key="c_custkey",
        expected_keys=100_000,
    )
    return hits.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


SQL_BLOOM_PRUNE_JOIN = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       {sql_dec2dbl("sum(CAST(o_totalprice AS DECIMAL(27,8)))")} AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY 1
"""


# ------------------------------------------ decimal-exact correlation
def q_price_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    bit-reproducible on any partitioning (functions/stable.py dcorr: the
    five sufficient sums in exact decimal, one double finish — F.corr's
    double accumulation would drift across partitionings and engines)."""
    from ..functions.stable import dcorr, davg

    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dcorr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
        davg("l_quantity").alias("avg_qty"),
    )


SQL_PRICE_CORRELATION = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       {sql_dcorr("l_quantity", "l_extendedprice")} AS qty_price_corr,
       {sql_davg("l_quantity")} AS avg_qty
FROM lineitem GROUP BY 1
"""


# -------------------------------------- RANGE-interval moving window
def q_moving_window_range(spark: SparkSession, sf: str) -> DataFrame:
    """Per-supplier 7-day moving revenue over ship dates using a RANGE
    frame on the epoch-day order key (rows at equal days enter the frame
    together — a ROWS frame can't express this). The windowed sum routes
    through decimal so tie-order inside the frame can't perturb the
    result; one shuffle keyed by supplier."""
    from pyspark.sql import Window

    from ..functions.stable import _dec2dbl

    li = load_table(spark, sf, "lineitem")
    day = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-6, 0)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,8)"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("ship_day"),
        _dec2dbl(F.sum(rev).over(w)).alias("mv7_revenue"),
        F.count(F.lit(1)).over(w).alias("mv7_n"),
    )


SQL_MOVING_WINDOW_RANGE = """
SELECT l_orderkey, l_linenumber, l_suppkey,
       CAST(l_shipdate AS DATE) AS ship_day,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8)))
            OVER w AS VARCHAR) AS DOUBLE) AS mv7_revenue,
       CAST(count(*) OVER w AS BIGINT) AS mv7_n
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY datediff('day', DATE '1970-01-01',
                               CAST(l_shipdate AS DATE)) ASC
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------- salted join
def q_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resistant salted join (operators/skew.py salted_join): events
    (user_id is power-law-ish) joined to a small per-user dimension with
    an 8-way salt — the skewed side spreads each hot key over 8 reducers,
    the dim replicates 8x. Result is exactly the plain inner join, which
    is the oracle."""
    from ..functions.stable import dsum
    from ..operators.skew import salted_join

    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "value"
    )
    dim = (
        load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_events"))
    )
    j = salted_join(ev, dim, keys=["user_id"], buckets=8)
    return j.groupBy("user_events").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("value").alias("value_sum"),
    )


SQL_SALTED_JOIN = f"""
WITH dim AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
  FROM events GROUP BY 1
)
SELECT d.user_events, CAST(count(*) AS BIGINT) AS n_rows,
       {sql_dec2dbl("sum(CAST(e.value AS DECIMAL(27,8)))")} AS value_sum
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY 1
"""


# ------------------------------------------------- inverted index
IDX_MAX_POSTINGS = 10


def q_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted index over document tokens (operators/text.py
    inverted_index): per-term document frequency + posting list truncated
    to the first 10 doc ids — rank-filtered BEFORE the collect so
    per-group state stays bounded at any corpus size."""
    from ..operators.text import inverted_index

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    return inverted_index(d, max_postings=IDX_MAX_POSTINGS)


SQL_INVERTED_INDEX = rf"""
WITH td AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents,
       unnest(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id ASC) AS r
  FROM td
)
SELECT term, CAST(max(r) AS BIGINT) AS df,
       list(doc_id ORDER BY doc_id ASC)
         FILTER (WHERE r <= {IDX_MAX_POSTINGS}) AS postings
FROM ranked GROUP BY 1
"""


# --------------------------------------- deterministic group sample
GS_K = 5
GS_SALT = ":smp42"


def q_group_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-group sample: k=5 documents per language, chosen by
    md5(doc_id + salt) order — the deterministic, engine-portable stand-in
    for a per-group reservoir (one shuffle keyed by group; rank window,
    no RNG state). Complements hash-threshold stratified sampling
    (operators/sampling.py) where group quotas are fractional."""
    d = load_table(spark, sf, "documents").select("doc_id", "lang")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(GS_SALT)))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.asc(key), F.asc("doc_id"))
    return (
        d.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= GS_K)
        .select("lang", "doc_id", "smp_rank")
    )


SQL_GROUP_SAMPLE = f"""
SELECT lang, doc_id, CAST(smp_rank AS BIGINT) AS smp_rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR || '{GS_SALT}') ASC, doc_id ASC
         ) AS smp_rank
  FROM documents
) WHERE smp_rank <= {GS_K}
"""


# ------------------------------------------ incremental join (IVM)
def q_incremental_join(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance for an inner join: orders/lineitem
    each split into base (key%4 != 0) and delta; the maintained join =
    old⋈old ∪ Δ-propagation (operators/incremental.py
    incremental_join_update — three delta-sized joins, never a re-join
    of the bases). The oracle computes the full join directly, proving
    the delta algebra is lossless. Output aggregated per order status
    so the check is compact."""
    from ..functions.stable import dsum
    from ..operators.incremental import incremental_join_update

    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    a_old = orders.filter(F.col("o_orderkey") % 4 != 0)
    da = orders.filter(F.col("o_orderkey") % 4 == 0)
    b_old = li.filter(F.col("o_orderkey") % 3 != 0)
    db = li.filter(F.col("o_orderkey") % 3 == 0)
    j = a_old.join(b_old, ["o_orderkey"], "inner").unionByName(
        incremental_join_update(a_old, da, b_old, db, ["o_orderkey"])
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("price_sum"),
    )


SQL_INCREMENTAL_JOIN = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       {sql_dec2dbl("sum(CAST(l_extendedprice AS DECIMAL(27,8)))")} AS price_sum
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


# --------------------------------------------------- z-order layout
ZORDER_BUCKETS = 16


def q_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustering proof (operators/zorder.py): Morton-interleave
    (l_partkey, l_suppkey), split into equi-depth buckets (the would-be
    files of an OPTIMIZE ZORDER rewrite), and emit per-bucket min/max
    spans — the data-skipping statistics a pruning reader would use. All
    integer bit arithmetic, so the oracle reproduces it exactly."""
    from ..operators.zorder import zorder_layout, zorder_skipping_stats

    li = load_table(spark, sf, "lineitem")
    # zorder_layout's internal persist is scoped to its own (eager)
    # boundary computation and released before it returns, so the
    # returned frame carries no cache even though this query's
    # DataFrame outlives the call
    layout = zorder_layout(li, "l_partkey", "l_suppkey", ZORDER_BUCKETS)
    return zorder_skipping_stats(layout, "l_partkey", "l_suppkey")


def _sql_morton(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


SQL_ZORDER_LAYOUT = f"""
WITH coded AS (
  SELECT l_partkey, l_suppkey,
         {_sql_morton("(l_partkey & 65535)", "(l_suppkey & 65535)")} AS zcode
  FROM lineitem
),
counts AS (
  SELECT zcode, count(*) AS n FROM coded GROUP BY 1
),
cum AS (
  SELECT zcode,
         COALESCE(sum(n) OVER (ORDER BY zcode ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below,
         sum(n) OVER () AS t
  FROM counts
),
buckets AS (
  SELECT zcode,
         LEAST(CAST(FLOOR(below * {ZORDER_BUCKETS} / t) AS INT),
               {ZORDER_BUCKETS - 1}) AS zbucket
  FROM cum
)
SELECT b.zbucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(c.l_partkey) AS x_min, max(c.l_partkey) AS x_max,
       min(c.l_suppkey) AS y_min, max(c.l_suppkey) AS y_max
FROM coded c JOIN buckets b ON c.zcode = b.zcode
GROUP BY 1
"""


def q_count_min_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch heavy-hitter check (functions/sketches.py):
    build the depth×width counter matrix over all document tokens (a
    mergeable, engine-portable sum — see cms_build docstring), then
    point-query the exact top-20 tokens and report estimated vs true
    count. est_n >= n_true always; the deterministic md5 hashing makes
    the whole sketch oracle-exact, unlike HLL."""
    from ..functions.sketches import cms_build, cms_estimate
    from ..operators.lsh import tokens

    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    counters = cms_build(toks, "tok")
    true_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .orderBy(F.desc("n_true"), F.asc("tok"))
        .limit(20)
    )
    est = cms_estimate(counters, true_top, "tok")
    return true_top.join(est, "tok").select("tok", "n_true", "est_n")


_SQL_CMS_BUCKET = (
    "('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tok), 1, 15))::BIGINT % 1024"
)

SQL_COUNT_MIN_FREQ = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
cells AS (
  SELECT tok, i, {_SQL_CMS_BUCKET} AS bucket
  FROM tok, range(0, 4) t(i)
),
counters AS (
  SELECT i, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
),
true_top AS (
  SELECT tok, count(*) AS n_true FROM tok GROUP BY 1
  ORDER BY n_true DESC, tok ASC LIMIT 20
),
probe AS (
  SELECT tt.tok, i, {_SQL_CMS_BUCKET.replace("tok", "tt.tok")} AS bucket
  FROM true_top tt, range(0, 4) t(i)
)
SELECT p.tok, t.n_true, min(c.cnt) AS est_n
FROM probe p
JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
JOIN true_top t ON t.tok = p.tok
GROUP BY 1, 2
"""


def q_zorder_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Data-skipping read over the Z-ordered layout (sources/skipping.py):
    write lineitem clustered on (l_partkey, l_suppkey) with zbucket as a
    partition dir + a min/max manifest, then answer a 2-D range filter by
    reading only manifest-overlapping buckets. Results are identical to a
    full scan + filter (the oracle IS that full scan); the pruning proof
    (inputFiles strictly shrinks) is pinned in tests/test_dimension_ops.py."""
    import os

    from ..sources.skipping import pruned_scan, write_zordered
    from ..sources.tables import build_once

    li = load_table(spark, sf, "lineitem")
    path = f"/tmp/zskip_{os.path.basename(os.path.normpath(sf))}"
    # idempotent layout build (sources/tables.py build_once): the
    # clustered write is a one-time layout job (like running OPTIMIZE
    # ZORDER); the QUERY under measurement is the manifest-pruned scan
    src = os.path.join(sf, "lineitem.parquet")
    stamp = f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{ZORDER_BUCKETS}"
    build_once(
        path,
        stamp,
        lambda: write_zordered(
            li.select("l_partkey", "l_suppkey", "l_quantity", "l_returnflag"),
            path, "l_partkey", "l_suppkey", ZORDER_BUCKETS,
        ),
    )
    scan = pruned_scan(
        spark, path, x_range=(100, 300), y_range=(10, 40),
        x_col="l_partkey", y_col="l_suppkey",
    )
    return scan.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


SQL_ZORDER_PRUNED_SCAN = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 300
  AND l_suppkey BETWEEN 10 AND 40
GROUP BY 1
"""


# ------------------------------------------------------ retention cohorts
def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention matrix: users cohorted by the ISO week of their
    first event; each (cohort_week, week_offset) cell counts distinct
    users from that cohort active that week, with the retention rate
    against cohort size. Two aggregations + one distinct projection —
    all keyed on (user) or (cohort, offset), linear and skew-free."""
    ev = load_table(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    cells = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.timestamp_diff("WEEK", F.col("cohort_week"), F.col("wk")).alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
        .alias("retention_rate"),
    )


SQL_RETENTION_COHORTS = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events
),
cells AS (
  SELECT f.cohort_week,
         date_diff('week', f.cohort_week, a.wk) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM active a JOIN firsts f USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY 1
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS retention_rate
FROM cells c JOIN sizes s USING (cohort_week)
"""


# ------------------------------------------------------ time gap-fill
def q_time_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style daily gap-fill (operators/gapfill.py): per-user
    daily average click value densified over each user's active span,
    with LOCF and linear-interpolation fills — Timescale's
    ``time_bucket_gapfill + locf() + interpolate()`` surface."""
    from ..functions.stable import davg
    from ..operators.gapfill import bucket_gapfill

    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "click")
    return bucket_gapfill(
        ev, key_cols=["user_id"], ts_col="ts",
        value_agg=davg("value"), unit="day",
    )


SQL_TIME_GAPFILL = f"""
WITH actual AS (
  SELECT user_id, date_trunc('day', ts) AS bucket, {sql_davg('value')} AS v
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
),
span AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM actual GROUP BY 1),
scaffold AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
  FROM span
),
dense AS (
  SELECT s.user_id, s.bucket, a.v
  FROM scaffold s LEFT JOIN actual a USING (user_id, bucket)
),
f AS (
  SELECT user_id, bucket, v,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    last_value(v IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
    first_value(v IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM dense
)
SELECT user_id, bucket, v,
  pv AS v_locf,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NULL THEN nv
       WHEN nv IS NULL THEN pv
       ELSE pv + (nv - pv) * (CAST(date_diff('day', pt, bucket) AS DOUBLE)
                              / CAST(date_diff('day', pt, nt) AS DOUBLE))
  END AS v_interp
FROM f
"""


QUERIES = {
    "q_event_funnel": q_event_funnel,
    "q_zorder_pruned_scan": q_zorder_pruned_scan,
    "q_count_min_freq": q_count_min_freq,
    "q_distinct_kmv": q_distinct_kmv,
    "q_hll_distinct": q_hll_distinct,
    "q_substring_dedup": q_substring_dedup,
    "q_substring_dedup_apply": q_substring_dedup_apply,
    "q_substring_index_delta": q_substring_index_delta,
    "q_cdc_dedup_apply": q_cdc_dedup_apply,
    "q_pagerank": q_pagerank,
    "q_triangle_count": q_triangle_count,
    "q_window_ranks": q_window_ranks,
    "q_fuzzy_match": q_fuzzy_match,
    "q_incremental_rollup": q_incremental_rollup,
    "q_scd2_history": q_scd2_history,
    "q_snapshot_diff": q_snapshot_diff,
    "q_bloom_prune_join": q_bloom_prune_join,
    "q_price_correlation": q_price_correlation,
    "q_moving_window_range": q_moving_window_range,
    "q_zorder_layout": q_zorder_layout,
    "q_incremental_join": q_incremental_join,
    "q_inverted_index": q_inverted_index,
    "q_group_sample": q_group_sample,
    "q_salted_join": q_salted_join,
    "q_time_gapfill": q_time_gapfill,
    "q_retention_cohorts": q_retention_cohorts,
}

ORACLES = {
    "q_time_gapfill": SQL_TIME_GAPFILL,
    "q_retention_cohorts": SQL_RETENTION_COHORTS,
    "q_scd2_history": SQL_SCD2_HISTORY,
    "q_snapshot_diff": SQL_SNAPSHOT_DIFF,
    "q_bloom_prune_join": SQL_BLOOM_PRUNE_JOIN,
    "q_price_correlation": SQL_PRICE_CORRELATION,
    "q_moving_window_range": SQL_MOVING_WINDOW_RANGE,
    "q_zorder_layout": SQL_ZORDER_LAYOUT,
    "q_zorder_pruned_scan": SQL_ZORDER_PRUNED_SCAN,
    "q_count_min_freq": SQL_COUNT_MIN_FREQ,
    "q_hll_distinct": SQL_HLL_DISTINCT,
    "q_incremental_join": SQL_INCREMENTAL_JOIN,
    "q_inverted_index": SQL_INVERTED_INDEX,
    "q_group_sample": SQL_GROUP_SAMPLE,
    "q_salted_join": SQL_SALTED_JOIN,
    "q_event_funnel": SQL_EVENT_FUNNEL,
    "q_distinct_kmv": SQL_DISTINCT_KMV,
    "q_substring_dedup": SQL_SUBSTRING_DEDUP,
    "q_substring_dedup_apply": SQL_SUBSTRING_DEDUP_APPLY,
    "q_substring_index_delta": SQL_SUBSTRING_INDEX_DELTA,
    "q_cdc_dedup_apply": SQL_CDC_DEDUP_APPLY,
    "q_pagerank": SQL_PAGERANK,
    "q_triangle_count": SQL_TRIANGLE_COUNT,
    "q_window_ranks": SQL_WINDOW_RANKS,
    "q_fuzzy_match": SQL_FUZZY_MATCH,
    "q_incremental_rollup": SQL_INCREMENTAL_ROLLUP,
}
