"""Reference-surface contract queries (SURVEY.md §2 → §7.4 mapping).

Every query is expressed over the driver's synthetic TPC-H-ish tables and
mirrors one (or a composition) of the reference pipeline's operators:
scans+typed projections (S1/P1), CASE bucketing (P3), latest-wins dedup
(W1), calendar dim generation (S3/P7), star joins (J1/J2), deterministic
OHLC rollups (A1-A3 with §4.3.1 fixed), top-k/limit (O1-O3), quality
assertions (V1-V8).

Determinism / oracle-stability conventions (see functions/stable.py):
- money aggregates go through decimal casts (order-independent),
- open/close use min/max over a struct sort key (single hash aggregate —
  cheaper at scale than the reference's window pattern and deterministic,
  unlike its bare first()/last(), build_stock_aggregations.py:88-89),
- every window order is a total order (unique tiebreaker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import (
    _dec2dbl, davg, dstddev, dsum,
    sql_davg, sql_dec2dbl, sql_dstddev, sql_dsum,
)
from ..operators.dedup import latest_wins
from ..sources.inline import build_dim_date_frame
from ..sources.tables import load_table


def _li(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "lineitem")


# ---------------------------------------------------------------- S1/P1/P5/P6
def q_scan_project_cast(spark: SparkSession, sf: str) -> DataFrame:
    """Typed wide projection with rename+cast (fact P1 analog,
    build_stock_fact_table.py:55-76) + derived money columns (P5)."""
    li = _li(spark, sf)
    # money math in decimal: raw 2dp doubles cast exactly, products stay
    # exact (no lossy decimal cast — Spark rounds scale-reduction HALF_UP,
    # DuckDB half-to-even). Final OUTPUT is always double via the string
    # hop (_dec2dbl): the driver's value hash is representation-sensitive
    # for decimals, so no final schema may carry one.
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc1 = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    tax1 = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extended_price"),
        _dec2dbl(ep * disc1).alias("revenue"),
        _dec2dbl(ep * disc1 * tax1).alias("charge"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.col("l_returnflag").alias("return_flag"),
    )


SQL_SCAN_PROJECT_CAST = f"""
SELECT
  l_orderkey AS order_key,
  l_linenumber AS line_number,
  l_quantity AS quantity,
  l_extendedprice AS extended_price,
  {sql_dec2dbl('''CAST(l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))''')} AS revenue,
  {sql_dec2dbl('''CAST(l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
       * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))''')} AS charge,
  CAST(l_shipdate AS DATE) AS ship_date,
  l_returnflag AS return_flag
FROM lineitem
"""


# ------------------------------------------------------------------- P3/P4
def q_case_bucketing(spark: SparkSession, sf: str) -> DataFrame:
    """CASE-WHEN tiering + constant columns (market-cap tier P3/P4 analog,
    build_stock_dimensions.py:57-64)."""
    part = load_table(spark, sf, "part")
    return part.select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_name").alias("part_name"),
        F.when(F.col("p_size") > 40, "Large")
        .when(F.col("p_size") > 20, "Medium")
        .otherwise("Small")
        .alias("size_tier"),
        F.lit("catalog").alias("source_system"),
        F.lit(True).alias("is_active"),
        # raw 2dp double passes through unchanged — no decimal in output
        F.col("p_retailprice").alias("retail_price"),
    )


SQL_CASE_BUCKETING = """
SELECT
  p_partkey AS part_key,
  p_name AS part_name,
  CASE WHEN p_size > 40 THEN 'Large'
       WHEN p_size > 20 THEN 'Medium'
       ELSE 'Small' END AS size_tier,
  'catalog' AS source_system,
  TRUE AS is_active,
  p_retailprice AS retail_price
FROM part
"""


# ---------------------------------------------------------------- W1/P8/P9
def q_dedup_latest(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-wins dedup (W1, build_stock_fact_table.py:39-48): one row per
    user, the most recent event; total order via (ts, event_id) desc."""
    ev = load_table(spark, sf, "events")
    return latest_wins(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("event_id", "ts", "user_id", "event_type", "value")


SQL_DEDUP_LATEST = """
SELECT event_id, ts, user_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# ------------------------------------------------------------------- S3/P7
def q_date_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Generated calendar dimension (S3/P7, build_stock_dimensions.py:112-141)
    — distributed sequence/explode instead of a driver-side loop."""
    return build_dim_date_frame(spark)


SQL_DATE_DIM = """
SELECT
  CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
  CAST(d AS DATE) AS date,
  CAST(year(d) AS INT) AS year,
  CAST(quarter(d) AS INT) AS quarter,
  CAST(month(d) AS INT) AS month,
  CAST(week(d) AS INT) AS week,
  dayname(d) AS day_of_week,
  isodow(d) <= 5 AS is_trading_day
FROM generate_series(DATE '2020-01-01', DATE '2026-12-31', INTERVAL 1 DAY) t(d)
"""


# ------------------------------------------------------------------- J1/J2
def q_star_join(spark: SparkSession, sf: str) -> DataFrame:
    """Fact↔dims star join (J1/J2, build_stock_aggregations.py:75-77).
    Dim sides are broadcast — no shuffle of the big fact side."""
    li = _li(spark, sf)
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    dims = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority", "c_mktsegment", "c_name")
    return li.join(
        F.broadcast(dims), li.l_orderkey == dims.o_orderkey, "left"
    ).select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        _dec2dbl(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("revenue"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("order_priority"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_name").alias("customer_name"),
    )


SQL_STAR_JOIN = f"""
SELECT
  l.l_orderkey AS order_key,
  l.l_linenumber AS line_number,
  {sql_dec2dbl('''CAST(l.l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))''')} AS revenue,
  CAST(o.o_orderdate AS DATE) AS order_date,
  o.o_orderpriority AS order_priority,
  c.c_mktsegment AS mktsegment,
  c.c_name AS customer_name
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ------------------------------------------------------------- A1 (weekly)
def _ohlc_rollup(li: DataFrame, period_col: F.Column, period_name: str) -> DataFrame:
    """Shared OHLCV rollup. open/close = extendedprice of the first/last
    line under the total order (shipdate, orderkey, linenumber) — the
    deterministic fix for the reference's bare first()/last()
    (SURVEY §4.3.1). min_by/max_by over the total order PACKED into one
    int64 (days<<40 | orderkey<<3 | linenumber; (shipdate, orderkey,
    linenumber) is a unique lineitem key, orderkey < 2^37 and
    linenumber < 8 at any published TPC-H SF) keeps it a single hash
    aggregate with scalar key compares — 2x faster than a 4-field struct
    min/max, one shuffle, map-side partials, no window sort."""
    sort_key = (
        F.datediff("l_shipdate", F.lit("1970-01-01")).cast("bigint") * (1 << 40)
        + F.col("l_orderkey") * 8
        + F.col("l_linenumber")
    )
    df = li.select(
        F.year("l_shipdate").cast("int").alias("year"),
        period_col.alias(period_name),
        F.col("l_suppkey").alias("supp_key"),
        sort_key.alias("sk"),
        "l_extendedprice", "l_quantity",
    )
    # Narrow-input guard: a single small parquet file scans as ONE
    # partition, serializing the decimal-heavy partial aggregate. When the
    # scan yields fewer partitions than cores, pre-shuffle the projected
    # (narrow) rows on the group keys so the aggregate runs complete and
    # parallel with that one exchange (3x at sf0.1). At cluster scale the
    # scan has >> cores partitions and this branch never fires — map-side
    # combine + AQE keep the normal partial/final plan.
    spark = li.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores, "year", period_name, "supp_key")
    open_c = F.min_by("l_extendedprice", "sk")
    close_c = F.max_by("l_extendedprice", "sk")
    # OHLC columns are raw l_extendedprice values — emitted as the raw
    # double, no decimal cast (driver hash rule: no DECIMAL in output)
    return df.groupBy("year", period_name, "supp_key").agg(
        open_c.alias("open_price"),
        close_c.alias("close_price"),
        F.max("l_extendedprice").alias("high_price"),
        F.min("l_extendedprice").alias("low_price"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        dstddev("l_extendedprice").alias("price_std_dev"),
        F.count(F.lit(1)).alias("n_lines"),
        ((close_c - open_c) / open_c * 100).cast("double").alias("return_pct"),
    )


def q_weekly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly OHLCV rollup (A1, build_stock_aggregations.py:80-97)."""
    return _ohlc_rollup(_li(spark, sf), F.weekofyear("l_shipdate").cast("int"), "week")


def q_monthly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly OHLCV rollup (A2, build_stock_aggregations.py:142-161)."""
    return _ohlc_rollup(_li(spark, sf), F.month("l_shipdate").cast("int"), "month")


def _sql_ohlc(period_expr: str, period_name: str) -> str:
    # arg_min/arg_max over the same packed int64 key the Spark side uses
    # (ordered-aggregate first/last also works; struct min/max is ~500x
    # slower in DuckDB and was the correctness gate's long pole)
    pk = ("date_diff('day', DATE '1970-01-01', l_shipdate)::BIGINT * 1099511627776 "
          "+ l_orderkey * 8 + l_linenumber")
    open_e = f"arg_min(l_extendedprice, {pk})"
    close_e = f"arg_max(l_extendedprice, {pk})"
    return f"""
SELECT
  CAST(year(l_shipdate) AS INT) AS year,
  CAST({period_expr} AS INT) AS {period_name},
  l_suppkey AS supp_key,
  {open_e} AS open_price,
  {close_e} AS close_price,
  max(l_extendedprice) AS high_price,
  min(l_extendedprice) AS low_price,
  {sql_dsum('l_quantity')} AS total_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_dstddev('l_extendedprice')} AS price_std_dev,
  count(*) AS n_lines,
  CAST((({close_e}) - ({open_e})) / ({open_e}) * 100 AS DOUBLE) AS return_pct
FROM lineitem
GROUP BY 1, 2, 3
"""


SQL_WEEKLY_ROLLUP = _sql_ohlc("week(l_shipdate)", "week")
SQL_MONTHLY_ROLLUP = _sql_ohlc("month(l_shipdate)", "month")


# ------------------------------------------------------------- A3 (sector)
def q_sector_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(date, segment) rollup (A3, build_stock_aggregations.py:206-217):
    avg/sum/count/stddev over a broadcast-joined dimension attribute."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
    )
    return joined.groupBy(
        F.to_date("o_orderdate").alias("order_date"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        davg("o_totalprice").alias("avg_order_price"),
        dsum("o_totalprice").alias("total_order_value"),
        F.count(F.lit(1)).alias("num_orders"),
        dstddev("o_totalprice").alias("price_volatility"),
    )


SQL_SECTOR_ROLLUP = f"""
SELECT
  CAST(o.o_orderdate AS DATE) AS order_date,
  c.c_mktsegment AS segment,
  {sql_davg('o.o_totalprice')} AS avg_order_price,
  {sql_dsum('o.o_totalprice')} AS total_order_value,
  count(*) AS num_orders,
  {sql_dstddev('o.o_totalprice')} AS price_volatility
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- A4 group
def q_group_count(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped counts + stable sums over the event stream (A3/A4 family)."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
    )


SQL_GROUP_COUNT = f"""
SELECT
  event_type,
  CAST(ts AS DATE) AS event_date,
  count(*) AS n_events,
  {sql_dsum('value')} AS total_value,
  {sql_davg('value')} AS avg_value
FROM events
GROUP BY 1, 2
"""


# ------------------------------------------------------------ O1-O3, top-k
def q_top_k_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders per customer by price — W1's ranking pattern
    generalized beyond rank 1."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select(
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.col("price_rank"),
        )
    )


SQL_TOP_K_PER_GROUP = """
SELECT
  o_custkey AS cust_key,
  o_orderkey AS order_key,
  o_totalprice AS total_price,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS price_rank
FROM orders
QUALIFY price_rank <= 3
"""


def q_limit_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ordered limit (O2/O3 sampling)."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .limit(10)
    )


SQL_LIMIT_SAMPLE = """
SELECT
  o_orderkey AS order_key,
  o_totalprice AS total_price,
  o_orderpriority AS order_priority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------------------ set ops
def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct EXCEPT / INTERSECT over customer vs supplier nations
    (§2.8 — free via Spark set operators)."""
    cust = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    cust_only = cust.subtract(supp).select(F.lit("customer_only").alias("tag"), "nationkey")
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "nationkey")
    return cust_only.unionByName(both)


SQL_SET_OPS = """
SELECT 'customer_only' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'both' AS tag, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


# ----------------------------------------------------- fact/dim compositions
def q_fact_build(spark: SparkSession, sf: str) -> DataFrame:
    """Full fact-build composition on the event stream: latest-wins dedup
    per (user, day) → typed projection → deterministic surrogate key →
    derived + constant columns (build_stock_fact_table.py:39-76 analog,
    with the §4.3.2 fix: content-addressed key instead of
    monotonically_increasing_id)."""
    ev = load_table(spark, sf, "events")
    ev = ev.withColumn("event_date", F.to_date("ts"))
    dedup = latest_wins(
        ev, ["user_id", "event_date"], [F.desc("ts"), F.desc("event_id")]
    )
    key_src = F.concat_ws("|", F.col("user_id"), F.col("event_date").cast("string"))
    return dedup.select(
        F.conv(F.substring(F.md5(key_src), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fact_key"),
        F.col("user_id"),
        F.col("event_date").alias("trade_date"),
        F.col("ts").alias("trade_timestamp"),
        F.col("value").alias("close_value"),
        F.col("event_type"),
        # exact bps: 2dp decimal * 100 is lossless, then the string hop
        _dec2dbl(F.col("value").cast("decimal(12,2)") * 100).alias("value_bps"),
        F.lit("2024-01-01").alias("processing_date"),
    )


SQL_FACT_BUILD = """
WITH dedup AS (
  SELECT *, CAST(ts AS DATE) AS event_date
  FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, CAST(ts AS DATE)
    ORDER BY ts DESC, event_id DESC
  ) = 1
)
SELECT
  ('0x' || substr(md5(user_id || '|' || strftime(event_date, '%Y-%m-%d')), 1, 15))::BIGINT AS fact_key,
  user_id,
  event_date AS trade_date,
  ts AS trade_timestamp,
  value AS close_value,
  event_type,
  CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS VARCHAR) AS DOUBLE) AS value_bps,
  '2024-01-01' AS processing_date
FROM dedup
"""


def q_dim_build(spark: SparkSession, sf: str) -> DataFrame:
    """Dimension-build composition on customer: tier bucketing + constant
    attributes + deterministic surrogate key (build_stock_dimensions.py:52-65
    analog)."""
    cust = load_table(spark, sf, "customer")
    return cust.select(
        F.conv(F.substring(F.md5(F.col("c_name")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("cust_dim_key"),
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("customer_name"),
        F.when(F.col("c_acctbal") > 7500, "Large")
        .when(F.col("c_acctbal") > 2500, "Mid")
        .otherwise("Small")
        .alias("balance_tier"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(True).alias("is_active"),
    )


SQL_DIM_BUILD = """
SELECT
  ('0x' || substr(md5(c_name), 1, 15))::BIGINT AS cust_dim_key,
  c_custkey AS cust_key,
  c_name AS customer_name,
  CASE WHEN c_acctbal > 7500 THEN 'Large'
       WHEN c_acctbal > 2500 THEN 'Mid'
       ELSE 'Small' END AS balance_tier,
  c_mktsegment AS segment,
  TRUE AS is_active
FROM customer
"""


# ------------------------------------------------------------------- V1-V8
_LINEITEM_COLUMNS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]


def q_quality_checks(spark: SparkSession, sf: str) -> DataFrame:
    """The GX expectation suite as relational assertions (V1-V8,
    docker/scripts/create_expectations.py): each check = one named
    violation count. V1 (ordered column-list match) evaluates the real
    schema via quality.expectations.columns_match on the Spark side and
    information_schema on the oracle side."""
    from ..quality.expectations import columns_match

    li = _li(spark, sf)

    def check(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(F.lit(name).alias("check_name"), F.col("violations"))

    v1 = columns_match(_LINEITEM_COLUMNS)
    cols_ok = spark.range(1).select(
        F.lit(0 if v1.schema_fn(li) else 1).cast("long").alias("violations")
    )

    null_keys = li.select(
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("violations")
    )
    qty_range = li.select(
        F.count(
            F.when(~F.col("l_quantity").between(0, 100), 1)
        ).alias("violations")
    )
    neg_price = li.select(
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("violations")
    )
    dup_pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(F.count(F.lit(1)).alias("violations"))
    )
    a_ge_b = li.select(
        F.count(
            F.when(F.col("l_extendedprice") < F.col("l_quantity"), 1)
        ).alias("violations")
    )
    flag_set = li.select(
        F.count(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1)
        ).alias("violations")
    )
    return (
        check("columns_match", cols_ok)
        .unionByName(check("null_order_key", null_keys))
        .unionByName(check("quantity_out_of_range", qty_range))
        .unionByName(check("negative_extended_price", neg_price))
        .unionByName(check("duplicate_pk", dup_pk))
        .unionByName(check("price_lt_quantity", a_ge_b))
        .unionByName(check("returnflag_not_in_set", flag_set))
    )


SQL_QUALITY_CHECKS = f"""
SELECT 'columns_match' AS check_name,
       CASE WHEN (SELECT string_agg(column_name, ',' ORDER BY ordinal_position)
                  FROM information_schema.columns
                  WHERE table_name = 'lineitem')
                 = '{",".join(_LINEITEM_COLUMNS)}'
            THEN 0 ELSE 1 END AS violations
UNION ALL
SELECT 'null_order_key',
       count(CASE WHEN l_orderkey IS NULL THEN 1 END) FROM lineitem
UNION ALL
SELECT 'quantity_out_of_range',
       count(CASE WHEN NOT (l_quantity BETWEEN 0 AND 100) THEN 1 END) FROM lineitem
UNION ALL
SELECT 'negative_extended_price',
       count(CASE WHEN l_extendedprice < 0 THEN 1 END) FROM lineitem
UNION ALL
SELECT 'duplicate_pk', count(*) FROM (
  SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
)
UNION ALL
SELECT 'price_lt_quantity',
       count(CASE WHEN l_extendedprice < l_quantity THEN 1 END) FROM lineitem
UNION ALL
SELECT 'returnflag_not_in_set',
       count(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) FROM lineitem
"""


# ---------------------------------------------------------------- K5/J4
def q_upsert_idempotent(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE idempotency invariant (K5/J4): upsert the same keyed batch
    twice; the result must equal one application. The oracle is the
    operation's fixed point — the latest-wins dedup of the batch itself —
    so the driver can value-check the stateful MERGE end-to-end."""
    from ..operators.dedup import latest_wins as _lw
    from ..operators.upsert import merge_upsert

    ev = load_table(spark, sf, "events")
    batch = _lw(
        ev.withColumn("event_date", F.to_date("ts")),
        ["user_id", "event_date"],
        [F.desc("ts"), F.desc("event_id")],
    ).select("user_id", "event_date", "event_id", "value")
    once = merge_upsert(None, batch, ["user_id", "event_date"])
    twice = merge_upsert(once, batch, ["user_id", "event_date"])
    return twice


SQL_UPSERT_IDEMPOTENT = """
SELECT user_id, CAST(ts AS DATE) AS event_date, event_id, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, CAST(ts AS DATE)
  ORDER BY ts DESC, event_id DESC
) = 1
"""


def q_merge_sql(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's literal MERGE INTO API (K5,
    build_stock_fact_table.py:104-111) through the SQL front
    (operators/merge_sql.py): January history is the target, February+
    events the source batch; matched (user, day) keys update, new keys
    insert."""
    from ..operators.dedup import latest_wins as _lw
    from ..operators.merge_sql import merge_into

    ev = load_table(spark, sf, "events").withColumn("event_date", F.to_date("ts"))
    dedup = _lw(
        ev, ["user_id", "event_date"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_date", "event_id", "value")
    dedup.filter(F.col("event_date") < "2024-02-01").createOrReplaceTempView(
        "merge_target"
    )
    dedup.filter(F.col("event_date") >= "2024-02-01").createOrReplaceTempView(
        "merge_source"
    )
    return merge_into(spark, """
        MERGE INTO merge_target t
        USING merge_source s
        ON t.user_id = s.user_id AND t.event_date = s.event_date
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)


SQL_MERGE_SQL = """
WITH dedup AS (
  SELECT user_id, CAST(ts AS DATE) AS event_date, event_id, value
  FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, CAST(ts AS DATE)
    ORDER BY ts DESC, event_id DESC
  ) = 1
),
t AS (SELECT * FROM dedup WHERE event_date < DATE '2024-02-01'),
s AS (SELECT * FROM dedup WHERE event_date >= DATE '2024-02-01')
SELECT * FROM s
UNION ALL
SELECT * FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM s
  WHERE s.user_id = t.user_id AND s.event_date = t.event_date
)
"""


def q_quarantine_split(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level validation routing (quality/expectations.py
    quarantine_split): route lineitem rows by which row-level checks they
    fail instead of failing the whole table — the badRecordsPath pattern
    with machine-readable reasons. Returns per-reason violation counts
    plus the surviving '_valid' count; SQL-three-valued-logic null
    handling keeps it oracle-exact."""
    from ..quality.expectations import quarantine_split, values_between

    li = load_table(spark, sf, "lineitem")
    checks = [
        values_between("l_quantity", 1, 45),
        values_between("l_discount", 0.0, 0.05),
    ]
    valid, invalid = quarantine_split(li, checks)
    per_reason = (
        invalid.select(F.explode("_violations").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    valid_row = valid.agg(
        F.lit("_valid").alias("reason"), F.count(F.lit(1)).alias("n_rows")
    )
    return per_reason.unionByName(valid_row)


SQL_QUARANTINE_SPLIT = """
SELECT 'values_between(l_quantity,1,45)' AS reason,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem WHERE NOT (l_quantity BETWEEN 1 AND 45)
UNION ALL
SELECT 'values_between(l_discount,0.0,0.05)' AS reason,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem WHERE NOT (l_discount BETWEEN 0.0 AND 0.05)
UNION ALL
SELECT '_valid' AS reason, CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
-- null-symmetric with quarantine_split: a NULL comparison is NOT a
-- violation, so NULL-bearing rows count as valid (a bare `x BETWEEN a
-- AND b` predicate would silently drop them from this arm)
WHERE NOT coalesce(NOT (l_quantity BETWEEN 1 AND 45), FALSE)
  AND NOT coalesce(NOT (l_discount BETWEEN 0.0 AND 0.05), FALSE)
"""


def q_gx_census(spark: SparkSession, sf: str) -> DataFrame:
    """Census of the declared GX suites: one row per (suite, position,
    check). The Spark side derives from the LIVE ``reference_suites()``
    registry; the oracle is an independent hand-enumerated transcription
    of docker/scripts/create_expectations.py — so this query goes red if
    the engine's suite declarations ever drift from the reference's 35
    check instances (fact 8 / dim 9 / weekly 9 / monthly 9)."""
    from ..quality.expectations import reference_suites

    rows = [
        (suite, i, c.name)
        for suite, checks in reference_suites().items()
        for i, c in enumerate(checks)
    ]
    return spark.createDataFrame(
        rows, "suite string, pos int, check_name string"
    )


SQL_GX_CENSUS = """
SELECT * FROM (VALUES
  ('fact_stock_daily_price', 0, 'columns_match(20)'),
  ('fact_stock_daily_price', 1, 'not_null(fact_key)'),
  ('fact_stock_daily_price', 2, 'not_null(stock_symbol)'),
  ('fact_stock_daily_price', 3, 'not_null(trade_date)'),
  ('fact_stock_daily_price', 4, 'not_null(close_price)'),
  ('fact_stock_daily_price', 5, 'unique(fact_key)'),
  ('fact_stock_daily_price', 6, 'compound_unique(stock_symbol,trade_date)'),
  ('fact_stock_daily_price', 7, 'row_count_between(1,100)'),
  ('dim_stock', 0, 'columns_match(10)'),
  ('dim_stock', 1, 'not_null(stock_key)'),
  ('dim_stock', 2, 'not_null(symbol)'),
  ('dim_stock', 3, 'not_null(company_name)'),
  ('dim_stock', 4, 'unique(stock_key)'),
  ('dim_stock', 5, 'unique(symbol)'),
  ('dim_stock', 6, 'values_in_set(symbol)'),
  ('dim_stock', 7, 'values_in_set(is_active)'),
  ('dim_stock', 8, 'row_count_between(1,100)'),
  ('agg_stock_weekly_metrics', 0, 'columns_match(13)'),
  ('agg_stock_weekly_metrics', 1, 'not_null(year)'),
  ('agg_stock_weekly_metrics', 2, 'not_null(week)'),
  ('agg_stock_weekly_metrics', 3, 'not_null(symbol)'),
  ('agg_stock_weekly_metrics', 4, 'not_null(week_close)'),
  ('agg_stock_weekly_metrics', 5, 'compound_unique(year,week,symbol)'),
  ('agg_stock_weekly_metrics', 6, 'values_between(week,1,53)'),
  ('agg_stock_weekly_metrics', 7, 'values_between(avg_price,0,10000)'),
  ('agg_stock_weekly_metrics', 8, 'pair_a_ge_b(week_high,week_low)'),
  ('agg_stock_monthly_metrics', 0, 'columns_match(15)'),
  ('agg_stock_monthly_metrics', 1, 'not_null(year)'),
  ('agg_stock_monthly_metrics', 2, 'not_null(month)'),
  ('agg_stock_monthly_metrics', 3, 'not_null(symbol)'),
  ('agg_stock_monthly_metrics', 4, 'not_null(month_close)'),
  ('agg_stock_monthly_metrics', 5, 'compound_unique(year,month,symbol)'),
  ('agg_stock_monthly_metrics', 6, 'values_between(month,1,12)'),
  ('agg_stock_monthly_metrics', 7, 'values_between(avg_price,0,10000)'),
  ('agg_stock_monthly_metrics', 8, 'pair_a_ge_b(month_high,month_low)')
) AS t(suite, pos, check_name)
"""


QUERIES = {
    "q_scan_project_cast": q_scan_project_cast,
    "q_upsert_idempotent": q_upsert_idempotent,
    "q_case_bucketing": q_case_bucketing,
    "q_dedup_latest": q_dedup_latest,
    "q_date_dim": q_date_dim,
    "q_star_join": q_star_join,
    "q_weekly_rollup": q_weekly_rollup,
    "q_monthly_rollup": q_monthly_rollup,
    "q_sector_rollup": q_sector_rollup,
    "q_group_count": q_group_count,
    "q_top_k_per_group": q_top_k_per_group,
    "q_limit_sample": q_limit_sample,
    "q_set_ops": q_set_ops,
    "q_fact_build": q_fact_build,
    "q_dim_build": q_dim_build,
    "q_quality_checks": q_quality_checks,
    "q_gx_census": q_gx_census,
    "q_quarantine_split": q_quarantine_split,
    "q_merge_sql": q_merge_sql,
}

ORACLES = {
    "q_scan_project_cast": SQL_SCAN_PROJECT_CAST,
    "q_case_bucketing": SQL_CASE_BUCKETING,
    "q_dedup_latest": SQL_DEDUP_LATEST,
    "q_date_dim": SQL_DATE_DIM,
    "q_star_join": SQL_STAR_JOIN,
    "q_weekly_rollup": SQL_WEEKLY_ROLLUP,
    "q_monthly_rollup": SQL_MONTHLY_ROLLUP,
    "q_sector_rollup": SQL_SECTOR_ROLLUP,
    "q_group_count": SQL_GROUP_COUNT,
    "q_top_k_per_group": SQL_TOP_K_PER_GROUP,
    "q_limit_sample": SQL_LIMIT_SAMPLE,
    "q_set_ops": SQL_SET_OPS,
    "q_fact_build": SQL_FACT_BUILD,
    "q_dim_build": SQL_DIM_BUILD,
    "q_quality_checks": SQL_QUALITY_CHECKS,
    "q_gx_census": SQL_GX_CENSUS,
    "q_quarantine_split": SQL_QUARANTINE_SPLIT,
    "q_upsert_idempotent": SQL_UPSERT_IDEMPOTENT,
    "q_merge_sql": SQL_MERGE_SQL,
}
