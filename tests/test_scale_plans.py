"""Plan-shape assertions: the physical-plan properties the 100 TB design
depends on must hold and stay held (pushdown, pruning, broadcast,
bucketed no-shuffle joins, sketch accuracy)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan
    # pruned read schema: only the two referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events").limit(1000)
    ev.write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # partition filter, not a data filter: nothing pushed into the row scan
    assert "PushedFilters: []" in plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    j = li.join(supp, li.l_suppkey == supp.s_suppkey, "left")
    j.write.format("noop").mode("overwrite").save()  # let AQE finalize
    assert "BroadcastHashJoin" in _plan(j)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # at test scale every table is broadcastable, which would bypass the
    # bucketed scan entirely; disable broadcast to exercise the co-located
    # sort-merge path a 100 TB fact-fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"],
    )
    try:
        j = bucketed_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
        agg = j.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan_join = _plan(j)
        plan_agg = _plan(agg)
        assert "Exchange" not in plan_join  # co-located: no shuffle either side
        # even the downstream groupBy on the bucket key needs no shuffle
        assert "Exchange" not in plan_agg
        # sanity: result matches the plain join
        assert j.count() == li.join(
            od.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"]
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey").alias("d")).first()["d"]
    approx = li.select(approx_distinct("l_orderkey", rsd=0.02).alias("d")).first()["d"]
    assert abs(approx - exact) / exact < 0.06  # 3 sigma at rsd=2%


def test_approx_quantiles_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    got = li.select(
        approx_quantiles("l_extendedprice", [0.5], accuracy=10_000).alias("q")
    ).first()["q"][0]
    # verify rank error <= n/accuracy (+1 row tolerance)
    rank = li.filter(F.col("l_extendedprice") <= got).count()
    assert abs(rank - 0.5 * n) <= n / 10_000 + 1


def test_weekly_rollup_is_single_aggregate(spark, sf_dir):
    """The OHLCV rollup must stay ONE hash aggregate (struct-key min/max),
    not a window sort + aggregate."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.reference import q_weekly_rollup

    plan = _plan(q_weekly_rollup(spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1  # the single groupBy shuffle


def test_q19_disjunctive_stays_hash_join(spark, sf_dir):
    """Catalyst must extract the common l_partkey = p_partkey equi-condition
    from the OR-of-ANDs predicate; a nested-loop here would be quadratic at
    100 TB."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.tpch_suite import (
        q_tpch_q19_disjunctive,
    )

    plan = _plan(q_tpch_q19_disjunctive(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_q18_having_filters_before_dimension_joins(spark, sf_dir):
    """The sum(l_quantity) > 300 HAVING must apply to the aggregate output
    BEFORE orders/customer attach, so only surviving keys join."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.tpch_suite import (
        q_tpch_q18_large_orders,
    )

    df = q_tpch_q18_large_orders(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the filter on total_qty sits in the plan (post-agg, pre-join)
    assert "total_qty" in opt and "300" in opt
    join_pos = opt.index("Join")
    agg_pos = opt.rindex("Aggregate")
    # bottom-up text: the aggregate producing total_qty prints BELOW
    # (after) the join that consumes it
    assert agg_pos > join_pos


def test_q21_decorrelated_no_nested_loop(spark, sf_dir):
    """The sole-late-supplier rewrite must plan as hash joins on
    l_orderkey (agg-then-join), never a correlated nested loop."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.tpch_suite import (
        q_tpch_q21_waiting_suppliers,
    )

    plan = _plan(q_tpch_q21_waiting_suppliers(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_q4_semi_join_never_widens(spark, sf_dir):
    """The EXISTS probe must stay a (left-)semi join: no duplicate orders,
    no lineitem columns surviving into the aggregate."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.tpch_suite import (
        q_tpch_q4_order_priority,
    )

    df = q_tpch_q4_order_priority(spark, sf_dir)
    assert "Semi" in _plan(df)
    assert df.columns == ["o_orderpriority", "order_count"]


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bounded-window range join must plan as a hash join on
    (user_id, bucket) with the range predicate as residual — a
    BroadcastNestedLoopJoin here is O(n*m) and a 100 TB non-starter."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.extended_ops import q_range_join

    df = q_range_join(spark, sf_dir)
    plan = _plan(df)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # and the join actually finds matches (not a vacuous pass)
    assert df.filter(F.col("n_prior_views") > 0).count() > 0


def test_prefix_join_and_lm_score_never_broadcast_corpus_frames(spark, sf_dir):
    """Regression for the r6 x100 OOM: derived size estimates of the
    shingle/dfreq/model frames bottom out at the compressed input file
    size, so past ~the broadcast threshold of raw input the static
    planner broadcast GB-scale builds. The merge hints must pin every
    corpus x corpus join in both operators to sort-merge — asserted on
    the plan so a refactor can't silently reintroduce the broadcast."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators import (
        lm_score,
        prefix_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(prefix_join.jaccard_prefix_pairs(docs, threshold=0.2))
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    model = lm_score.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    scored = lm_score.score_docs(docs, model)
    splan = _plan(scored)
    # the two model joins must be sort-merge; the final one-row-per-doc
    # reattach join (doc_id-keyed agg result) may broadcast — it is
    # output-sized, not model-sized, and AQE sizes it at runtime
    assert splan.count("SortMergeJoin") >= 2
