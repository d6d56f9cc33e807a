"""Extended TPC-H-shaped analytical suite (Q1, Q2, Q4, Q6-Q9, Q11-Q16,
Q18-Q22 analogs; Q3/Q5/Q10/Q17 live in extended_ops.py — the full classic
22 are covered).

The reference's analytical layer is three OHLCV rollups
(/root/reference/glue/jobs/build_stock_aggregations.py:80-217); these
queries prove the same engine spine (broadcast star joins, conditional
aggregates, correlated/EXISTS subqueries, disjunctive pushdown, HAVING,
scalar subqueries, anti joins) generalizes to the full classic analytical
workload. Shapes are adapted to the testdata schema: there is no partsupp
table and no l_commitdate/l_receiptdate/l_shipmode/c_phone columns, so
Q4/Q12 use ship-lateness vs o_orderdate, Q21 uses a 60-day ship-lateness
rule, and Q22's "country code" is c_nationkey.

Scale notes (100 TB design):
- Every dimension leg (nation, region, part at 1% of lineitem) broadcasts;
  the only large shuffles are the final groupBys on low-cardinality keys.
- Q17/Q21-style correlated subqueries are expressed as aggregate-then-
  self-join on the correlation key, so both sides shuffle ONCE on the same
  key (no nested-loop, AQE can pick sort-merge at scale).
- Share ratios (Q8/Q14) route sums through exact decimal partials
  (order-independent, see functions/stable.py) and do the single final
  division in double — reproducible cluster-to-laptop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import davg, sql_davg
from ..sources.tables import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )


_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)


def _dec2dbl(c: F.Column) -> F.Column:
    # string hop: engine-identical decimal->double (functions/stable.py)
    return c.cast("string").cast("double")


# --------------------------------------------------------------- Q4 analog
def q_tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join + group count. Orders in 1996Q3 that had
    at least one lineitem shipped >90 days after the order date, counted
    per priority. The semi join keeps the probe side small (one quarter of
    orders) and never widens rows — no duplicate elimination needed."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- Q6 analog
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate, no joins. All three predicates
    push to the parquet scan (PushedFilters); the aggregate is a single
    partial+final with one row out — the cheapest possible plan."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = F.col("l_extendedprice").cast("decimal(18,4)") * F.col(
        "l_discount"
    ).cast("decimal(18,4)")
    return li.agg(
        _dec2dbl(F.sum(disc_rev)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_TPCH_Q6 = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------- Q7 analog
def q_tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship year.
    nation joins twice under different roles (supplier's vs customer's) —
    both broadcast; the disjunctive nation-pair predicate is applied after
    both legs attach."""
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == n1.s_nkey)
        .join(n2, cust.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dec2dbl(F.sum(_rev())).alias("volume"))
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(CAST(SUM({_SQL_REV}) AS VARCHAR) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
"""


# --------------------------------------------------------------- Q8 analog
def q_tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's yearly ECONOMY-part
    revenue. Conditional numerator + total in ONE aggregate pass; the
    share division happens once per output row in double (both operands
    string-hopped from exact decimal sums — engine-identical)."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    nation_c = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    nation_s = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    rev = _rev()
    brazil_rev = _dec2dbl(F.sum(
        F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ))
    total_rev = _dec2dbl(F.sum(rev))
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation_c, cust.c_nationkey == nation_c.c_nkey)
        .join(region, nation_c.c_rkey == region.r_regionkey)
        .join(nation_s, supp.s_nationkey == nation_s.s_nkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            brazil_rev.alias("nation_rev"),
            total_rev.alias("total_rev"),
        )
    )
    return out.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    ).orderBy("o_year")


SQL_TPCH_Q8 = f"""
WITH base AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_SQL_REV}
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS nation_rev,
         CAST(CAST(SUM({_SQL_REV}) AS VARCHAR) AS DOUBLE) AS total_rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  GROUP BY EXTRACT(year FROM o_orderdate)
)
SELECT o_year, nation_rev, total_rev,
       nation_rev / total_rev AS mkt_share
FROM base
ORDER BY o_year
"""


# -------------------------------------------------------------- Q12 analog
def q_tpch_q12_late_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape: conditional priority counts per class for late-shipped
    lines (adapted: return-flag classes + 30-day ship lateness instead of
    shipmode/commit/receipt dates). One join, one group, two CASE sums —
    everything stays in whole-stage codegen."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
         AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# -------------------------------------------------------------- Q14 analog
def q_tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: promo-revenue share for one month. part broadcasts
    (100:1 vs lineitem); numerator and denominator in one aggregate; final
    percentage as a single double division."""
    part = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    rev = _rev()
    out = li.join(part, li.l_partkey == part.p_partkey).agg(
        _dec2dbl(F.sum(
            F.when(F.col("p_type") == "PROMO", rev).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        )).alias("promo_rev"),
        _dec2dbl(F.sum(rev)).alias("total_rev"),
    )
    return out.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
    )


SQL_TPCH_Q14 = f"""
WITH base AS (
  SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV}
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS promo_rev,
         CAST(CAST(SUM({_SQL_REV}) AS VARCHAR) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
)
SELECT promo_rev, total_rev,
       100.0 * promo_rev / total_rev AS promo_pct
FROM base
"""


# -------------------------------------------------------------- Q18 analog
def q_tpch_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: HAVING over a big-table aggregate, then join the
    surviving keys back to orders/customer. The having-filter runs BEFORE
    the dimension joins, so only ~the top permille of orders ever joins —
    at 100 TB the post-aggregate side is tiny and broadcasts."""
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# -------------------------------------------------------------- Q19 analog
def q_tpch_q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs join predicate (brand x size-range x
    qty-range). Catalyst extracts the common l_partkey = p_partkey
    equi-condition so this stays a hash join with a residual disjunctive
    filter — not a nested-loop."""
    part = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.filter(clause).agg(
        _dec2dbl(F.sum(_rev())).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_TPCH_Q19 = f"""
SELECT CAST(CAST(SUM({_SQL_REV}) AS VARCHAR) AS DOUBLE) AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# -------------------------------------------------------------- Q21 analog
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order (lateness adapted to ship-date > order
    date + 60 days). The classic EXISTS/NOT-EXISTS pair is rewritten as
    a TWO-LEVEL aggregate over the order joined back on l_orderkey — the
    (orderkey, suppkey) rollup then a plain per-order count/sum, instead
    of two COUNT DISTINCTs (which Catalyst plans as an Expand that
    triples the aggregate input). The join-back probes per_supp (one row
    per (order, supp), supp_late already computed) rather than re-scanning
    lineitem — the big table is scanned, joined, and shuffled exactly
    ONCE, with the shuffled exchange reused across both consumers; and
    since a sole-late order contributes exactly one (order, supp) row,
    numwait is a plain count, no distinct Expand. Oracle SQL keeps the
    EXISTS/NOT-EXISTS formulation as an independent check of the
    rewrite."""
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    sole_late = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    return (
        per_supp.filter(F.col("supp_late") == 1)
        .join(sole_late, "l_orderkey")
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


SQL_TPCH_Q21 = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# -------------------------------------------------------------- Q22 analog
def q_tpch_q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: scalar subquery (global positive-balance average) +
    NOT EXISTS anti join + final rollup. Adapted: "country code" is
    c_nationkey (no c_phone column) and "idle" means no order since
    1999-01-01 (every testdata customer has SOME order). The 1-row
    average cross-joins (broadcast) onto the filter; the order list is
    filtered and key-projected before the anti join so the build side is
    narrow."""
    cust = load_table(spark, sf, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    active = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(active, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec2dbl(F.sum(F.col("c_acctbal").cast("decimal(18,4)")))
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_TPCH_Q22 = f"""
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {sql_davg("c_acctbal")} FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY cntrycode
"""



# -------------------------------------------------------------- Q13 analog
def q_tpch_q13_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: outer join + double aggregation (orders per customer,
    then customers per order-count) — the classic histogram-of-counts.
    Adapted: the excluded-comment predicate becomes "not 1-URGENT" (no
    o_comment column). Scale shape: one shuffle on custkey for the outer
    join + first agg (co-partitioned), then a tiny shuffle on the count —
    the second agg's key cardinality is the max orders-per-customer."""
    cust = load_table(spark, sf, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -------------------------------------------------------------- Q15 analog
def q_tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: revenue view + scalar-max self-comparison (suppliers
    whose quarterly revenue equals the global max). The revenue aggregate
    is computed ONCE and reused for both the max and the equality filter;
    decimal partials make the equality deterministic (double sums would
    make "== max" partition-order-dependent). The 1-row max broadcasts."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev()).alias("total_revenue_dec")
    )
    max_rev = rev.agg(F.max("total_revenue_dec").alias("max_rev"))
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue_dec") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            _dec2dbl(F.col("total_revenue_dec")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_SQL_REV}) AS total_revenue_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(CAST(total_revenue_dec AS VARCHAR) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
ORDER BY s_suppkey
"""



# ------------------------------------------------ derived partsupp (Q2/Q9)
# The testdata has no partsupp table; its two partsupp-dependent shapes
# are recovered with a DERIVED supplier-part relation: the distinct
# (l_partkey, l_suppkey) pairs that actually traded, with a supply cost
# that is a deterministic integer function of the key pair — identical
# arithmetic in both engines, so parity is exact and the JOIN SHAPES
# (min-cost join-back, 6-way profit rollup) are the real thing.
def _supplycost_dec() -> F.Column:
    # 100..149, keyed by (partkey, suppkey); decimal(18,4) for exact math
    return (
        F.lit(100) + (F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 50
    ).cast("decimal(18,4)")


_SQL_SUPPLYCOST = (
    "CAST(100 + (l_partkey * 31 + l_suppkey * 17) % 50 AS DECIMAL(18,4))"
)


# --------------------------------------------------------------- Q2 analog
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: per-group minimum + equality join-back (the correlated
    subquery of classic Q2, decorrelated). For every EUROPE-supplied part,
    find the supplier(s) achieving the minimum derived supply cost.
    Scale shape: partsupp derives from lineitem with one distinct (hash
    agg on the pair key), region/nation broadcast into supplier, the
    min-per-part aggregate and the join-back shuffle ONCE on partkey
    each — no nested loop anywhere."""
    li = load_table(spark, sf, "lineitem")
    ps = (
        li.select("l_partkey", "l_suppkey").distinct()
        .withColumn("supplycost_dec", _supplycost_dec())
    )
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    euro_ps = ps.join(
        euro_supp, ps.l_suppkey == euro_supp.s_suppkey
    )
    min_cost = euro_ps.groupBy("l_partkey").agg(
        F.min("supplycost_dec").alias("min_cost_dec")
    )
    return (
        euro_ps.join(min_cost, "l_partkey")
        .filter(F.col("supplycost_dec") == F.col("min_cost_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            _dec2dbl(F.col("supplycost_dec")).alias("supplycost"),
        )
        .orderBy(F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
    )


SQL_TPCH_Q2 = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
psc AS (
  SELECT l_partkey, l_suppkey, {_SQL_SUPPLYCOST} AS supplycost_dec FROM ps
),
euro AS (
  SELECT psc.*, s_name, n_name
  FROM psc
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
mins AS (
  SELECT l_partkey, min(supplycost_dec) AS min_cost_dec FROM euro GROUP BY l_partkey
)
SELECT e.l_partkey AS p_partkey, e.l_suppkey AS s_suppkey, e.s_name, e.n_name,
       CAST(CAST(e.supplycost_dec AS VARCHAR) AS DOUBLE) AS supplycost
FROM euro e JOIN mins m
  ON e.l_partkey = m.l_partkey AND e.supplycost_dec = m.min_cost_dec
ORDER BY p_partkey ASC, s_suppkey ASC
LIMIT 100
"""


# --------------------------------------------------------------- Q9 analog
def q_tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: the 5-way profit rollup — lineitem x orders x supplier x
    nation x part, profit = revenue - supplycost * quantity, grouped by
    (supplier nation, order year). Part filter keeps the classic
    LIKE-on-name probe. Scale shape: nation/part/supplier broadcast,
    orders co-shuffles with lineitem on orderkey once, ONE final hash agg
    on (nation, year) — the fact table never shuffles twice."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    part = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    profit = (_rev() - _supplycost_dec() * F.col("l_quantity").cast("decimal(18,4)"))
    return (
        # part/supplier scale with SF (unbounded at 100 TB) — no hint,
        # AQE broadcasts them when runtime stats say they fit.  nation
        # is 25 rows by spec: hint is provably bounded.
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dec2dbl(F.sum(profit)).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate)::INT AS o_year,
       CAST(CAST(SUM({_SQL_REV} - {_SQL_SUPPLYCOST}
                     * CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


# --------------------------------------------------------------- Q1 analog
def q_tpch_q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Q1 shape: the classic full-scan pricing summary — one wide hash
    aggregate over ~99% of lineitem with 8 aggregates on 2 low-cardinality
    keys. Scale shape: single pass, partial (map-side) aggregation does
    almost all the work, the shuffle moves |flags|x|status| rows per
    partition. Sums route through exact decimal partials; averages are one
    double divide at the end (order-independent, cluster==laptop)."""
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    qty = F.col("l_quantity").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    tax = F.col("l_tax").cast("decimal(18,4)")
    disc_price = price * (1 - disc)
    charge = price * (1 - disc) * (1 + tax)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec2dbl(F.sum(qty)).alias("sum_qty"),
            _dec2dbl(F.sum(price)).alias("sum_base_price"),
            _dec2dbl(F.sum(disc_price)).alias("sum_disc_price"),
            _dec2dbl(F.sum(charge)).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM({_SQL_REV}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM({_SQL_REV} * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- derived availqty (Q11/Q20)
def _availqty() -> F.Column:
    # 1..1000, keyed by (partkey, suppkey) — same arithmetic both engines
    return (
        F.lit(1) + (F.col("l_partkey") * 7 + F.col("l_suppkey") * 11) % 1000
    ).cast("int")


_SQL_AVAILQTY = "CAST(1 + (l_partkey * 7 + l_suppkey * 11) % 1000 AS INT)"


# -------------------------------------------------------------- Q11 analog
def q_tpch_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: grouped value rollup filtered by a GLOBAL scalar
    threshold (HAVING sum > fraction * total). partsupp derives from
    lineitem (see _supplycost_dec); availqty is a deterministic key
    function. Scale shape: the 1-row total broadcasts onto the per-part
    aggregate (no second shuffle of the big side); nation filter broadcasts
    into supplier. Threshold compare happens in DOUBLE on both engines
    (string-hopped sums), so the cut is bit-identical."""
    li = load_table(spark, sf, "lineitem")
    ps = (
        li.select("l_partkey", "l_suppkey").distinct()
        .withColumn("supplycost_dec", _supplycost_dec())
        .withColumn("availqty", _availqty())
    )
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    nat_ps = (
        # the one-nation supplier set still scales with SF — unhinted
        # (AQE decides); the 25-row nation frame keeps its hint.
        ps.join(supp.join(
            F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
        ).select("s_suppkey"), ps.l_suppkey == F.col("s_suppkey"))
        .withColumn(
            "value_dec",
            F.col("supplycost_dec") * F.col("availqty").cast("decimal(18,4)"),
        )
    )
    per_part = nat_ps.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        _dec2dbl(F.sum("value_dec")).alias("value")
    )
    total = nat_ps.agg(_dec2dbl(F.sum("value_dec")).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("total_value") * 0.001)
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


SQL_TPCH_Q11 = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
nat_ps AS (
  SELECT l_partkey,
         {_SQL_SUPPLYCOST} * CAST({_SQL_AVAILQTY} AS DECIMAL(18,4)) AS value_dec
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey AS ps_partkey,
       CAST(CAST(SUM(value_dec) AS VARCHAR) AS DOUBLE) AS value
FROM nat_ps
GROUP BY l_partkey
HAVING CAST(CAST(SUM(value_dec) AS VARCHAR) AS DOUBLE) >
       (SELECT CAST(CAST(SUM(value_dec) AS VARCHAR) AS DOUBLE) FROM nat_ps) * 0.001
ORDER BY value DESC, ps_partkey ASC
"""


# -------------------------------------------------------------- Q16 analog
def q_tpch_q16_supplier_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT) over an anti-joined many-to-many
    relation, grouped by part attributes. Adapted: supplier has no
    s_comment, so the "customer complaints" exclusion is negative-balance
    suppliers — the NOT IN anti-join shape is intact. Scale shape: part
    (1% of lineitem) and the tiny exclusion list broadcast; the only big
    shuffle is the final distinct-count aggregate, keyed on attributes."""
    li = load_table(spark, sf, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        # part and the negative-balance supplier set both scale with SF
        # — unhinted, AQE chooses the physical join per runtime size.
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(bad_supp, ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


SQL_TPCH_Q16 = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# -------------------------------------------------------------- Q20 analog
def q_tpch_q20_excess_stock(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: the doubly-nested IN subquery (suppliers holding excess
    stock of promotable parts), decorrelated: 1997 shipments aggregate by
    (part, supp) once, join the derived partsupp on the same key, compare
    availqty > 0.5 * shipped, then semi-join supplier. Scale shape: both
    big sides shuffle ONCE on (partkey, suppkey); the part name filter
    broadcasts; the final supplier semi join is broadcast-sized. The
    0.5x compare is double-vs-double (string-hopped sum), bit-identical."""
    li = load_table(spark, sf, "lineitem")
    part = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dec2dbl(F.sum(F.col("l_quantity").cast("decimal(18,4)"))).alias("qty_1997"))
    )
    ps = (
        li.select("l_partkey", "l_suppkey").distinct()
        .withColumn("availqty", _availqty())
        .join(part, F.col("l_partkey") == part.p_partkey)  # SF-scaled: no hint
    )
    excess = (
        ps.join(shipped, ["l_partkey", "l_suppkey"])
        .filter(F.col("availqty") > F.lit(0.5) * F.col("qty_1997"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q20 = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
           AS qty_1997
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.l_suppkey
  FROM ps
  JOIN part ON ps.l_partkey = p_partkey
  JOIN shipped ON ps.l_partkey = shipped.l_partkey
              AND ps.l_suppkey = shipped.l_suppkey
  WHERE p_name LIKE '%bolt%'
    AND {_SQL_AVAILQTY.replace('l_partkey', 'ps.l_partkey').replace('l_suppkey', 'ps.l_suppkey')} > 0.5 * qty_1997
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_suppkey
"""


QUERIES = {
    "q_tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "q_tpch_q4_order_priority": q_tpch_q4_order_priority,
    "q_tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
    "q_tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
    "q_tpch_q8_market_share": q_tpch_q8_market_share,
    "q_tpch_q12_late_lines": q_tpch_q12_late_lines,
    "q_tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    "q_tpch_q18_large_orders": q_tpch_q18_large_orders,
    "q_tpch_q19_disjunctive": q_tpch_q19_disjunctive,
    "q_tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
    "q_tpch_q22_idle_customers": q_tpch_q22_idle_customers,
    "q_tpch_q13_order_distribution": q_tpch_q13_order_distribution,
    "q_tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "q_tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
    "q_tpch_q9_product_profit": q_tpch_q9_product_profit,
    "q_tpch_q11_important_stock": q_tpch_q11_important_stock,
    "q_tpch_q16_supplier_parts": q_tpch_q16_supplier_parts,
    "q_tpch_q20_excess_stock": q_tpch_q20_excess_stock,
}

ORACLES = {
    "q_tpch_q1_pricing_summary": SQL_TPCH_Q1,
    "q_tpch_q4_order_priority": SQL_TPCH_Q4,
    "q_tpch_q6_forecast_revenue": SQL_TPCH_Q6,
    "q_tpch_q7_volume_shipping": SQL_TPCH_Q7,
    "q_tpch_q8_market_share": SQL_TPCH_Q8,
    "q_tpch_q12_late_lines": SQL_TPCH_Q12,
    "q_tpch_q14_promo_revenue": SQL_TPCH_Q14,
    "q_tpch_q18_large_orders": SQL_TPCH_Q18,
    "q_tpch_q19_disjunctive": SQL_TPCH_Q19,
    "q_tpch_q21_waiting_suppliers": SQL_TPCH_Q21,
    "q_tpch_q22_idle_customers": SQL_TPCH_Q22,
    "q_tpch_q13_order_distribution": SQL_TPCH_Q13,
    "q_tpch_q15_top_supplier": SQL_TPCH_Q15,
    "q_tpch_q2_min_cost_supplier": SQL_TPCH_Q2,
    "q_tpch_q9_product_profit": SQL_TPCH_Q9,
    "q_tpch_q11_important_stock": SQL_TPCH_Q11,
    "q_tpch_q16_supplier_parts": SQL_TPCH_Q16,
    "q_tpch_q20_excess_stock": SQL_TPCH_Q20,
}
