"""Extended operator coverage beyond the reference surface: as-of join,
rollup grouping sets, distinct aggregation, IVF probe search, and the
skew-salted aggregation path.

These are the ops a production lakehouse needs that the reference (a
5-row/day ETL) never hits — each implemented Spark-first and checked
against an INDEPENDENT DuckDB formulation (e.g. the as-of join oracle
uses DuckDB's native ASOF JOIN against our union-tag-carry plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import _dec2dbl, dsum, sql_dec2dbl, sql_dsum
from ..operators.asof import asof_join
from ..operators.rangejoin import preceding_window_join
from ..operators.similarity import ivf_search, ivf_search_quantized
from ..operators.skew import salted_sum_count
from ..sources.tables import load_table


# ------------------------------------------------------------- as-of join
def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Each purchase gets the user's most recent view at-or-before it
    (point-in-time lookup; operators/asof.py union-tag-carry plan,
    validated against DuckDB's native ASOF JOIN)."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join(
        purchases,
        views,
        by=["user_id"],
        ts_col="ts",
        right_order_col="event_id",
        right_payload=["event_id", "ts"],
        prefix="view_",
    )


SQL_ASOF_JOIN = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
v AS (  -- dedup equal (user, ts): highest event_id wins (engine tie rule)
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       v.event_id AS view_event_id, v.ts AS view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# ------------------------------------------------------------ range join
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-interval range join: per purchase event, how many views the
    same user made in the preceding hour (operators/rangejoin.py — hour
    buckets turn the range predicate into an equi join + residual; the
    oracle uses DuckDB's native inequality join as the independent
    formulation)."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined, matched = preceding_window_join(
        purchases, views, keys=["user_id"], window_seconds=3600
    )
    return joined.groupBy(
        F.col("__l.event_id").alias("event_id"),
        F.col("__l.user_id").alias("user_id"),
    ).agg(F.count(F.when(matched, 1)).alias("n_prior_views"))


SQL_RANGE_JOIN = """
SELECT p.event_id, p.user_id, count(v.ts) AS n_prior_views
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


# ------------------------------------------------------ rollup grouping sets
def q_rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (year, returnflag): detail + per-year subtotal + grand
    total in one pass, grouping_id disambiguating subtotal NULLs."""
    li = load_table(spark, sf, "lineitem").select(
        F.year("l_shipdate").cast("int").alias("year"),
        F.col("l_returnflag").alias("flag"),
        "l_quantity",
    )
    return li.rollup("year", "flag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping_id().alias("gid"),
    )


def q_cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combinations
    in one pass."""
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        "l_quantity",
    )
    return li.cube("flag", "status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping_id().alias("gid"),
    )


SQL_CUBE_AGG = f"""
SELECT flag, status, count(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty,
       CAST(GROUPING(flag, status) AS BIGINT) AS gid
FROM (SELECT l_returnflag AS flag, l_linestatus AS status, l_quantity FROM lineitem)
GROUP BY CUBE(flag, status)
"""


SQL_ROLLUP_AGG = f"""
SELECT year, flag, count(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty,
       CAST(GROUPING(year, flag) AS BIGINT) AS gid
FROM (
  SELECT CAST(year(l_shipdate) AS INT) AS year, l_returnflag AS flag, l_quantity
  FROM lineitem
)
GROUP BY ROLLUP(year, flag)
"""


# --------------------------------------------------------- distinct aggregate
def q_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """count(DISTINCT) — absent from the reference's aggregate family;
    Spark expands it to a two-level aggregate (dedup shuffle + final)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
FROM lineitem GROUP BY 1
"""


# ------------------------------------------------------------- IVF search
_SQL_EMB = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_SQL_D2 = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


def q_ann_ivf_search(spark: SparkSession, sf: str) -> DataFrame:
    """ANN query through the IVF index: probe the 2 centroids nearest the
    query (vec 0), brute-force only inside those buckets, top-5."""
    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_search(emb, centroids, qv, k=5, nprobe=2)


def q_ann_ivf_search_quantized(spark: SparkSession, sf: str) -> DataFrame:
    """The same ANN probe through int8-quantized inverted lists + exact
    re-score (operators/similarity.py ivf_search_quantized). Its contract
    is bit-equality with the full-precision probe, so the oracle is the
    full-precision SQL — a value mismatch means the quantized shortlist
    lost a true top-k candidate."""
    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_search_quantized(emb, centroids, qv, k=5, nprobe=2)


SQL_ANN_IVF_SEARCH = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
assign AS (
  SELECT vec_id, (min(struct_pack(
           d2 := {_SQL_D2.format(a='v', b='cv')},
           cid := c.centroid_id))).cid AS centroid_id
  FROM e CROSS JOIN c GROUP BY vec_id
),
probe AS (
  SELECT centroid_id FROM c, q
  ORDER BY {_SQL_D2.format(a='cv', b='qv')} ASC, centroid_id ASC LIMIT 2
)
SELECT e.vec_id,
       list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
         AS cosine
FROM e
JOIN assign USING (vec_id)
JOIN probe USING (centroid_id), q
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


# ----------------------------------------- partition-pruned IVF probe
def q_ann_ivf_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """The same ANN probe as ``q_ann_ivf_search``, but against the
    materialized IVF layout (operators/similarity.py
    ivf_write_partitioned): the corpus is written parquet-partitioned by
    centroid assignment — one Hive directory per inverted list — and the
    probe reads ONLY the nprobe winning directories (non-probed lists
    are never even listed; tests/test_operators.py pins the inputFiles
    shrink). At 100 TB this is the difference between scanning the
    corpus per query and scanning nprobe/k_centroids of it; the oracle
    is the identical full-precision probe semantics."""
    import os

    from ..operators.similarity import (
        ivf_search_partitioned,
        ivf_write_partitioned,
    )
    from ..sources.tables import build_once

    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # idempotent layout build (the q_zorder_pruned_scan marker pattern):
    # building the inverted lists is a one-time index job; the QUERY
    # under measurement is the pruned probe
    path = f"/tmp/ivfpart_{os.path.basename(os.path.normpath(sf))}"
    src = os.path.join(sf, "embeddings.parquet")
    stamp = f"{os.path.abspath(src)}|{os.path.getmtime(src)}|8|m1"  # m1: manifest layout
    build_once(path, stamp, lambda: ivf_write_partitioned(emb, centroids, path))
    return ivf_search_partitioned(spark, path, centroids, qv, k=5, nprobe=2)


# --------------------------------------------------------- ANN recall@k
ANN_RECALL_K = 5
ANN_RECALL_NPROBE = 2
ANN_RECALL_NQ = 5  # eval queries = vectors 0..4 (corpus members)


def q_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k eval of the IVF probe vs the exact top-k
    (operators/similarity.py ann_recall): 5 eval queries, per-query
    overlap between the probed-bucket top-5 and the brute-force top-5.
    The number every ANN deployment must measure before trusting the
    approximate path — the oracle recomputes both sides exactly."""
    from ..operators.similarity import ann_recall

    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    queries_df = emb.filter(F.col("vec_id") < ANN_RECALL_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_recall(
        emb, centroids, queries_df, k=ANN_RECALL_K, nprobe=ANN_RECALL_NPROBE
    )


SQL_ANN_RECALL = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {ANN_RECALL_NQ}),
scored AS (
  SELECT qs.query_id, e.vec_id,
         list_dot_product(e.v, qs.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv)))
           AS cos
  FROM e CROSS JOIN qs
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= {ANN_RECALL_K}
),
assign AS (
  SELECT vec_id, (min(struct_pack(
           d2 := {_SQL_D2.format(a='v', b='cv')},
           cid := c.centroid_id))).cid AS centroid_id
  FROM e CROSS JOIN c GROUP BY vec_id
),
probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT qs.query_id, c.centroid_id,
           row_number() OVER (PARTITION BY qs.query_id
                              ORDER BY {_SQL_D2.format(a='cv', b='qv')} ASC,
                                       c.centroid_id ASC) AS rn
    FROM c CROSS JOIN qs) WHERE rn <= {ANN_RECALL_NPROBE}
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT s.query_id, s.vec_id,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY s.cos DESC, s.vec_id ASC) AS rn
    FROM scored s
    JOIN assign a ON s.vec_id = a.vec_id
    JOIN probe p ON p.query_id = s.query_id AND p.centroid_id = a.centroid_id
  ) WHERE rn <= {ANN_RECALL_K}
)
SELECT ex.query_id,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hits,
       count(ap.vec_id) / {ANN_RECALL_K}.0 AS recall
FROM exact ex
LEFT JOIN approx ap ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
GROUP BY 1
"""


# -------------------------------------------------------- salted aggregation
def q_skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage salted SUM/COUNT over a 5-hot-key distribution — must be
    bit-identical to the plain single-stage oracle (decimal partials)."""
    ev = load_table(spark, sf, "events")
    return salted_sum_count(ev, ["event_type"], F.col("value"), buckets=32)


SQL_SKEW_SALTED_AGG = f"""
SELECT event_type, {sql_dsum('value')} AS sum_value, count(*) AS n_rows
FROM events GROUP BY 1
"""


# ------------------------------------------------------------ SQL entry (S7)
_Q1_BODY = """
SELECT
  l_returnflag AS return_flag,
  l_linestatus AS line_status,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,8))) AS {str_t}) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,8))) AS {str_t}) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS {str_t}) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(27,8))) AS {str_t}) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_sql_entry(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL front door (reference S7: validation queries arrive as SQL
    text): register views, run TPC-H-Q1-shaped SQL through spark.sql —
    same Catalyst plan as the DataFrame API, pushdown included. The
    oracle runs the IDENTICAL statement modulo the string-type keyword
    (Spark: STRING, DuckDB: VARCHAR)."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q1_BODY.format(str_t="STRING"))


SQL_SQL_ENTRY = _Q1_BODY.format(str_t="VARCHAR")


# ------------------------------------------------------------ pivot/unpivot
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide reshape: one row per user, one count column per event type.
    The value list is pinned (no discovery pass); Spark plans a single
    hash aggregate with pivot expressions — same shape as the CASE-sum
    oracle."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


SQL_PIVOT = "SELECT user_id, " + ", ".join(
    f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES
) + " FROM events GROUP BY 1"


def q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Long reshape (melt): part size/retail metrics to (key, metric,
    value) rows via unpivot — the inverse operator."""
    part = load_table(spark, sf, "part")
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select(
        "p_partkey", "metric", F.col("value").cast("double").alias("value")
    )


SQL_UNPIVOT = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE) FROM part
"""


# -------------------------------------------------------- semi / anti joins
def q_semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS/NOT EXISTS as join operators: customers WITH open orders
    (left_semi) and WITHOUT any order (left_anti), one labeled result.
    Semi/anti never duplicate the left side — the planner probes a
    broadcast/hash set instead of materializing matches."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    with_open = cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("has_open_order").alias("label"))
    no_orders = cust.join(
        orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("label"))
    return with_open.unionByName(no_orders)


SQL_SEMI_ANTI_JOIN = """
SELECT c_custkey, 'has_open_order' AS label FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'no_orders' FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ------------------------------------------------------- lag/lead + frames
def q_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """Row-offset window functions over a per-supplier date order: previous
    /next price, delta, and a trailing 3-row moving sum (explicit frame) —
    the window family beyond the reference's lone row_number."""
    li = load_table(spark, sf, "lineitem")
    from pyspark.sql import Window

    w = Window.partitionBy("l_suppkey").orderBy(
        F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    frame = w.rowsBetween(-2, 0)
    # raw prices pass through as double; DERIVED window values (delta,
    # frame sum) compute in decimal — DuckDB's segment-tree window agg
    # reorders FP addition — then string-hop to double for the output
    price_dec = F.col("l_extendedprice").cast("decimal(18,4)")
    return li.select(
        F.col("l_suppkey").alias("supp_key"),
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
        _dec2dbl(price_dec - F.lag(price_dec).over(w)).alias("price_delta"),
        _dec2dbl(F.sum(price_dec).over(frame)).alias("trailing3_sum"),
    )


SQL_LAG_LEAD = f"""
SELECT l_suppkey AS supp_key, l_orderkey, l_linenumber,
  l_extendedprice AS price,
  lag(l_extendedprice) OVER w AS prev_price,
  lead(l_extendedprice) OVER w AS next_price,
  {sql_dec2dbl('''CAST(l_extendedprice AS DECIMAL(18,4))
    - lag(CAST(l_extendedprice AS DECIMAL(18,4))) OVER w''')} AS price_delta,
  {sql_dec2dbl('''sum(CAST(l_extendedprice AS DECIMAL(18,4)))
    OVER (PARTITION BY l_suppkey
          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')} AS trailing3_sum
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
"""


# ----------------------------------------------------- TPC-H-shaped suite
def q_tpch_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q3 shape: selective filters on both sides of a 3-way join, grouped
    revenue, top-10 by revenue. Catalyst pushes the segment/date filters
    below the joins; customer and filtered orders broadcast."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec2dbl(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q5 shape: 6-way snowflake join (lineitem at the center; region ->
    nation -> customer/supplier colocation predicate), grouped revenue.
    All dimension legs broadcast; the only big shuffle is the final
    groupBy."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_dec2dbl(F.sum(rev)).alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name AS nation,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer over a quarter,
    4-way join, top-20 — the report query pattern (join, filter, group,
    order, limit)."""
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment", F.col("n_name").alias("nation"))
        .agg(_dec2dbl(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_mktsegment, n_name AS nation,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_mktsegment, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q17_small_qty(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery — lineitems whose quantity is
    below 20% of their part's average. Expressed as SQL so Catalyst's
    subquery decorrelation rewrites it to the aggregate-then-join plan
    (the same shape the hand-written DataFrame version would build)."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_partkey AS part_key,
               count(*) AS n_small,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
                 AS small_revenue
        FROM lineitem l1
        WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
        )
        GROUP BY l_partkey
    """)


SQL_TPCH_Q17 = """
SELECT l_partkey AS part_key, count(*) AS n_small,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS small_revenue
FROM lineitem l1
WHERE l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
)
GROUP BY l_partkey
"""


def q_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join: per-nation customer and supplier counts aligned,
    keeping nations present on either side only."""
    cust = (
        load_table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("nk") % 3 != 0)  # make each side partial
    )
    supp = (
        load_table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("nk") % 3 != 1)
    )
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nation_key"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


SQL_FULL_OUTER_JOIN = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
  GROUP BY 1 HAVING c_nationkey % 3 != 0
),
s AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
  GROUP BY 1 HAVING s_nationkey % 3 != 1
)
SELECT COALESCE(c.nk, s.nk) AS nation_key,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


# -------------------------------------------------------- exact percentiles
def q_group_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quartiles per group (F.percentile — a sort-based
    aggregate; both engines interpolate low + frac*(high-low) in double,
    verified bit-identical). The mergeable sketch path for 100 TB is
    functions/sketches.py hist_build/hist_quantiles (q_hist_quantiles)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.75).alias("p75"),
    )


SQL_GROUP_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75
FROM lineitem GROUP BY 1
"""


# --------------------------------------------- histogram quantile sketch
HIST_WIDTH = 100.0
HIST_QS = [0.5, 0.95, 0.99]


def q_hist_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable fixed-grid histogram quantile sketch (the 100 TB twin
    of q_group_quantiles): bucket counts are input-size-independent
    state merged by sum; each estimate lands within one bucket width of
    the exact nearest-rank order statistic (the provable sketch bound).
    Deterministic — no t-digest/KLL sampling — so the whole estimator is
    DuckDB-oracle-exact."""
    from ..functions.sketches import hist_build, hist_quantiles

    li = load_table(spark, sf, "lineitem")
    h = hist_build(li, ["l_returnflag"], "l_extendedprice", HIST_WIDTH)
    return hist_quantiles(h, ["l_returnflag"], HIST_WIDTH, HIST_QS)


def _sql_hist_quantiles() -> str:
    w = repr(HIST_WIDTH)
    qlist = ", ".join(f"'{q!r}'::DOUBLE" for q in HIST_QS)
    return f"""
WITH hist AS (
  SELECT l_returnflag, CAST(floor(l_extendedprice / {w}) AS BIGINT) AS bucket,
         count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, bucket, n,
         CAST(sum(n) OVER (PARTITION BY l_returnflag ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows
  FROM hist
),
cq AS (SELECT c.*, q FROM c, (SELECT unnest([{qlist}]) AS q)),
cand AS (
  SELECT *, greatest(CAST(1 AS BIGINT), CAST(ceil(q * CAST(n_rows AS DOUBLE)) AS BIGINT)) AS r
  FROM cq
),
pick AS (
  SELECT l_returnflag, q, min(bucket) AS bucket
  FROM cand WHERE cum >= r GROUP BY 1, 2
)
SELECT p.l_returnflag, p.q,
       CAST(a.bucket AS DOUBLE) * {w}
         + {w} * (CAST(a.r - (a.cum - a.n) AS DOUBLE) / CAST(a.n AS DOUBLE))
         AS est_quantile,
       a.n_rows
FROM pick p
JOIN cand a ON a.l_returnflag = p.l_returnflag AND a.q = p.q
            AND a.bucket = p.bucket
"""


# ------------------------------------------------------------ JSON columns
def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON column functions (beyond the reference's typed-read-only JSON
    use): parse events.props with an explicit schema via from_json —
    single JVM-side parse, no inference pass — bucket and aggregate."""
    ev = load_table(spark, sf, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


SQL_JSON_EXTRACT = f"""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n, {sql_dsum('value')} AS sum_value
FROM events GROUP BY 1
"""


# ------------------------------------------------------ rolling z-score
ROLL_FRAME = 19  # trailing 20-row frame


def q_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling anomaly detection over the event stream: per-user trailing
    20-row mean/stddev of `value`, z-score of the current row, flag at
    |z| > 2.5. The time-series primitive behind price-spike / volume-spike
    monitors (the reference's OHLCV world has no per-tick analytics).

    Determinism: rolling sums accumulate in DECIMAL (DuckDB's segment-tree
    window agg reorders FP addition; decimal is exact either way), then
    ONE string-hop to double; variance/sqrt/divide are identical IEEE
    expression trees on both engines — bit-exact, any partitioning.

    Scale shape: one shuffle (hash by user), sort within partitions,
    single Window node computes all three frame aggregates; the frame is
    row-bounded so state per key is O(20) — no unbounded-preceding memory
    growth. Hot users are bounded by the frame, not their row count."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    ).rowsBetween(-ROLL_FRAME, 0)
    vd = F.col("value").cast("decimal(16,4)")
    n = F.count(F.lit(1)).over(w)
    s1 = _dec2dbl(F.sum(vd).over(w))
    s2 = _dec2dbl(F.sum(vd * vd).over(w))
    nd = n.cast("double")
    mean = s1 / nd
    var = F.greatest((s2 - s1 * s1 / nd) / (nd - F.lit(1.0)), F.lit(0.0))
    std = F.when(n > 1, F.sqrt(var))
    z = F.when((n > 1) & (F.sqrt(var) > 0), (F.col("value") - mean) / F.sqrt(var))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        n.alias("roll_n"),
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        z.alias("zscore"),
        (F.abs(z) > 2.5).alias("is_anomaly"),
    )


def _sql_rolling_zscore() -> str:
    cd = "CAST(value AS DECIMAL(19,4))"
    n = "CAST(count(*) OVER w AS DOUBLE)"
    s1 = sql_dec2dbl(f"sum({cd}) OVER w")
    s2 = sql_dec2dbl(f"sum({cd} * {cd}) OVER w")
    mean = f"({s1}) / ({n})"
    var = f"GREATEST((({s2}) - ({s1}) * ({s1}) / ({n})) / (({n}) - 1.0), 0.0)"
    std = f"CASE WHEN count(*) OVER w > 1 THEN SQRT({var}) END"
    z = (f"CASE WHEN count(*) OVER w > 1 AND SQRT({var}) > 0 "
         f"THEN (value - ({mean})) / SQRT({var}) END")
    return f"""
SELECT event_id, user_id, value,
       count(*) OVER w AS roll_n,
       {mean} AS roll_mean,
       {std} AS roll_std,
       {z} AS zscore,
       abs({z}) > 2.5 AS is_anomaly
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW)
"""


SQL_ROLLING_ZSCORE = _sql_rolling_zscore()


# ---------------------------------------------------------- SQL DDL front
def q_sql_ddl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """CTAS + INSERT-append + read back through the SQL DDL front
    (operators/sql_ddl.py) over a scratch name-addressed catalog: the
    reference's CREATE / CREATE-OR-REPLACE / write-branch surface as the
    SQL a user would type. The oracle recomputes the final table state
    straight from lineitem, so the round-trip (two commits, positional
    INSERT rename, catalog name resolution) is value-checked."""
    import os
    import shutil

    from ..operators.sql_ddl import SqlFront
    from ..sources.catalog import NameCatalog

    # deterministic per-sf scratch warehouse, wiped on entry: the DDL
    # writes ARE the query, so they re-run each invocation, but at most
    # ONE table copy per sf ever exists on disk — a fresh mkdtemp per
    # call leaked one full lineitem copy per bench rep (ADVICE r4)
    root = f"/tmp/sqlddl_wh_{os.path.basename(os.path.normpath(sf))}"
    shutil.rmtree(root, ignore_errors=True)
    front = SqlFront(
        NameCatalog(spark, root, catalog_name="local_catalog")
    )
    load_table(spark, sf, "lineitem").createOrReplaceTempView("li_src")
    cols = "l_orderkey, l_linenumber, l_returnflag, l_quantity"
    front.execute(
        f"CREATE TABLE local_catalog.wh.flagged AS SELECT {cols} "
        f"FROM li_src WHERE l_returnflag = 'R'"
    )
    front.execute(
        f"INSERT INTO local_catalog.wh.flagged SELECT {cols} "
        f"FROM li_src WHERE l_returnflag = 'A'"
    )
    return front.execute(
        "SELECT l_returnflag, count(*) AS n_rows, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM local_catalog.wh.flagged GROUP BY l_returnflag"
    )


SQL_SQL_DDL_ROUNDTRIP = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_returnflag IN ('R', 'A')
GROUP BY 1
"""


QUERIES = {
    "q_sql_entry": q_sql_entry,
    "q_json_extract": q_json_extract,
    "q_group_quantiles": q_group_quantiles,
    "q_hist_quantiles": q_hist_quantiles,
    "q_sql_ddl_roundtrip": q_sql_ddl_roundtrip,
    "q_tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
    "q_tpch_q5_local_supplier": q_tpch_q5_local_supplier,
    "q_tpch_q10_returned_items": q_tpch_q10_returned_items,
    "q_tpch_q17_small_qty": q_tpch_q17_small_qty,
    "q_full_outer_join": q_full_outer_join,
    "q_pivot": q_pivot,
    "q_unpivot": q_unpivot,
    "q_semi_anti_join": q_semi_anti_join,
    "q_lag_lead": q_lag_lead,
    "q_rolling_zscore": q_rolling_zscore,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_rollup_agg": q_rollup_agg,
    "q_cube_agg": q_cube_agg,
    "q_distinct_agg": q_distinct_agg,
    "q_ann_ivf_search": q_ann_ivf_search,
    "q_ann_ivf_pruned": q_ann_ivf_pruned,
    "q_ann_recall": q_ann_recall,
    "q_ann_ivf_search_quantized": q_ann_ivf_search_quantized,
    "q_skew_salted_agg": q_skew_salted_agg,
}

ORACLES = {
    "q_sql_entry": SQL_SQL_ENTRY,
    "q_json_extract": SQL_JSON_EXTRACT,
    "q_group_quantiles": SQL_GROUP_QUANTILES,
    "q_hist_quantiles": _sql_hist_quantiles(),
    "q_sql_ddl_roundtrip": SQL_SQL_DDL_ROUNDTRIP,
    "q_tpch_q3_shipping_priority": SQL_TPCH_Q3,
    "q_tpch_q5_local_supplier": SQL_TPCH_Q5,
    "q_tpch_q10_returned_items": SQL_TPCH_Q10,
    "q_tpch_q17_small_qty": SQL_TPCH_Q17,
    "q_full_outer_join": SQL_FULL_OUTER_JOIN,
    "q_pivot": SQL_PIVOT,
    "q_unpivot": SQL_UNPIVOT,
    "q_semi_anti_join": SQL_SEMI_ANTI_JOIN,
    "q_lag_lead": SQL_LAG_LEAD,
    "q_rolling_zscore": SQL_ROLLING_ZSCORE,
    "q_asof_join": SQL_ASOF_JOIN,
    "q_range_join": SQL_RANGE_JOIN,
    "q_rollup_agg": SQL_ROLLUP_AGG,
    "q_cube_agg": SQL_CUBE_AGG,
    "q_distinct_agg": SQL_DISTINCT_AGG,
    "q_ann_ivf_search": SQL_ANN_IVF_SEARCH,
    "q_ann_ivf_pruned": SQL_ANN_IVF_SEARCH,
    "q_ann_recall": SQL_ANN_RECALL,
    "q_ann_ivf_search_quantized": SQL_ANN_IVF_SEARCH,
    "q_skew_salted_agg": SQL_SKEW_SALTED_AGG,
}
