"""Unit tests for funnel, KMV sketch, substring dedup, and fixed-point
PageRank — tiny hand-checkable frames with exact-value asserts, plus
partitioning-invariance checks (the repo's determinism contract)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import kmv_distinct
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.funnel import funnel_stages
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.pagerank import (
    SCALE,
    co_order_edges,
    pagerank_fixed_point,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
    substring_dup_stats,
)


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def test_funnel_stages_ordering_and_breaks(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes the whole funnel in order
            (1, "view", _ts(1)),
            (1, "click", _ts(2)),
            (1, "purchase", _ts(3)),
            # u2: click BEFORE the first view only -> funnel breaks at 2;
            # the user must still appear (conditional-min, not filter)
            (2, "click", _ts(1)),
            (2, "view", _ts(2)),
            (2, "purchase", _ts(3)),
            # u3: never viewed -> not in the funnel at all
            (3, "click", _ts(1)),
            # u4: view then purchase but no click -> stage 1, t3 null
            # (purchase without a click can't advance the funnel)
            (4, "view", _ts(1)),
            (4, "purchase", _ts(2)),
            # u5: same-timestamp click (strictly-after rule -> no credit)
            (5, "view", _ts(1)),
            (5, "click", _ts(1)),
        ],
        ["user_id", "event_type", "ts"],
    )
    out = {
        r["user_id"]: (r["stage"], r["t2"], r["t3"])
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1] == (3, _ts(2), _ts(3))
    assert out[2] == (1, None, None)
    assert 3 not in out
    assert out[4] == (1, None, None)
    assert out[5] == (1, None, None)


def test_funnel_purchase_requires_click_after(spark):
    # purchase exists but before the click -> stage 2
    ev = spark.createDataFrame(
        [
            (1, "view", _ts(1)),
            (1, "purchase", _ts(2)),
            (1, "click", _ts(3)),
        ],
        ["user_id", "event_type", "ts"],
    )
    row = funnel_stages(ev, ["view", "click", "purchase"]).collect()[0]
    assert (row["stage"], row["t2"], row["t3"]) == (2, _ts(3), None)


def test_kmv_exact_below_k_and_close_above(spark):
    rows = [("small", f"v{i}") for i in range(10)] + [
        ("big", f"x{i}") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, ["grp", "val"])
    got = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(df, ["grp"], "val", k=64).collect()
    }
    assert got["small"] == 10.0  # < k -> exact count
    # KMV with k=64 has rsd ~ 1/sqrt(62) ~ 13%; allow 4 sigma
    assert abs(got["big"] - 5000) / 5000 < 0.5

    # partitioning invariance: same estimate under any repartition
    re = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(
            df.repartition(13, "val"), ["grp"], "val", k=64
        ).collect()
    }
    assert re == got


def test_count_min_overestimates_and_merges(spark):
    """CMS invariants: est >= true for every probed value; counters are
    partitioning-invariant (mergeable sum); a union's sketch equals the
    cell-wise sum of the parts' sketches."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"w{i % 50}",) for i in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, ["tok"])
    counters = cms_build(df, "tok", depth=4, width=256)
    true = {r["tok"]: r["n"] for r in df.groupBy("tok").count().withColumnRenamed("count", "n").collect()}
    est = {
        r["tok"]: r["est_n"]
        for r in cms_estimate(counters, df, "tok", depth=4, width=256).collect()
    }
    assert set(est) == set(true)
    assert all(est[t] >= true[t] for t in true)
    assert est["hot"] < 500 + 2 * 3500 / 256 * 4  # loose CMS bound

    # partitioning invariance
    re = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_build(df.repartition(7, "tok"), "tok", depth=4, width=256).collect()
    }
    base = {
        (r["row_i"], r["bucket"]): r["cnt"] for r in counters.collect()
    }
    assert re == base

    # mergeability: sketch(a union b) == sketch(a) + sketch(b) cell-wise
    a = df.filter(F.crc32(F.col("tok")) % 2 == 0)
    b = df.filter(F.crc32(F.col("tok")) % 2 == 1)
    merged = (
        cms_build(a, "tok", depth=4, width=256)
        .unionByName(cms_build(b, "tok", depth=4, width=256))
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got_m = {
        (r["row_i"], r["bucket"]): r["cnt"] for r in merged.collect()
    }
    assert got_m == base


def test_substring_dup_stats_exact(spark):
    shared = "S" * 100  # shared run >= window+stride -> must be caught
    docs = spark.createDataFrame(
        [
            (1, "A" * 30 + shared + "B" * 40),
            (2, "C" * 55 + shared + "D" * 15),
            (3, "unique text " * 20),
            (4, "tiny"),  # < window -> zero windows, dup_frac 0.0
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in substring_dup_stats(docs, window=64, stride=32).collect()
    }
    # doc 4: too short
    assert out[4] == (0, 0, 0.0)
    # docs 1 and 2 share an all-S 64-window ("S"*64 appears in both at
    # some stride offset); doc 3 shares nothing
    assert out[1][1] > 0 and out[2][1] > 0
    assert out[3][1] == 0
    # window count formula: 1 + floor((len - 64) / 32)
    for doc, text_len in [(1, 170), (2, 170), (3, 240)]:
        assert out[doc][0] == 1 + (text_len - 64) // 32


def test_pagerank_symmetric_triangle_uniform(spark):
    # complete symmetric triangle: ranks must stay exactly uniform
    edges = spark.createDataFrame(
        [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b],
        ["src", "dst"],
    )
    ranks = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_fixed_point(edges, iters=3).collect()
    }
    assert len(set(ranks.values())) == 1
    # total mass stays ~1.0 (fixed-point floor loses < 1e-9 relative)
    assert abs(sum(ranks.values()) - SCALE) < 100


def test_pagerank_star_center_dominates_and_deterministic(spark):
    # star: 1..5 all point at 6 and back -> 6 gets ~5x the leaf rank
    edges = spark.createDataFrame(
        [(i, 6) for i in range(1, 6)] + [(6, i) for i in range(1, 6)],
        ["src", "dst"],
    )
    r1 = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_fixed_point(edges, iters=3).collect()
    }
    assert r1[6] > 3 * r1[1]
    r2 = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_fixed_point(
            edges.repartition(7, "dst"), iters=3
        ).collect()
    }
    assert r1 == r2  # integer arithmetic: bit-equal on any partitioning


def test_co_order_edges_symmetric_no_self_loops(spark):
    li = spark.createDataFrame(
        [(100, 1), (100, 2), (100, 2), (101, 2), (101, 3), (102, 9)],
        ["l_orderkey", "l_partkey"],
    )
    edges = {(r["src"], r["dst"]) for r in co_order_edges(li).collect()}
    assert edges == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_triangle_stats_exact(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    # triangle 1-2-3 plus pendant 4 attached to 3
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {
        r["node"]: (r["deg"], r["n_tri"], r["clustering_coeff"])
        for r in triangle_stats(edges).collect()
    }
    assert out[1] == (2, 1, 1.0)
    assert out[2] == (2, 1, 1.0)
    # node 3: deg 3, one triangle among 3 possible neighbor pairs
    assert out[3] == (3, 1, 2.0 * 1 / (3 * 2))
    assert out[4] == (1, 0, 0.0)


def test_fuzzy_match_pairs_blocked(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.fuzzy import (
        first_token,
        fuzzy_match_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme korp"),   # dist 1, same block
            (3, "acme international holdings"),  # same block, too far
            (4, "zenith corp"), # different block: never compared
        ],
        ["id", "name"],
    )
    got = [
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_match_pairs(
            df, "id", "name", first_token("name"), max_dist=2
        ).collect()
    ]
    assert got == [(1, 2, 1)]


def test_incremental_merge_equals_full(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.incremental import (
        finalize_rollup,
        merge_partials,
        partial_rollup,
    )

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)]
        + [("b", 0.1 * i) for i in range(50)],
        ["k", "v"],
    )
    # three arbitrary disjoint batches, merged in a skewed tree shape
    b0 = partial_rollup(df.filter("v < 10"), ["k"], "v")
    b1 = partial_rollup(df.filter("v >= 10 AND v < 40"), ["k"], "v")
    b2 = partial_rollup(df.filter("v >= 40"), ["k"], "v")
    merged = finalize_rollup(merge_partials(merge_partials(b0, b1), b2))
    full = finalize_rollup(partial_rollup(df, ["k"], "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_accuracy_merge_and_partition_invariance(spark):
    """Deterministic HLL: (a) raw-estimator accuracy within the
    expected ~1.04/sqrt(256) band at 10k distinct, (b) register states
    from disjoint slices MAX-merge to exactly the whole-corpus state,
    (c) the estimate is partitioning-invariant (integer register sum)."""
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import (
        hll_distinct,
        hll_registers,
    )

    df = spark.range(0, 10_000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    est = hll_distinct(df, ["grp"], "v").collect()[0]
    # 3 sigma of HLL's 1.04/sqrt(m) relative error at m=256 is ~19.5%
    assert abs(est["distinct_est"] - 10_000) / 10_000 < 0.2
    assert est["n_buckets"] == 256  # 10k >> m: every register hit

    # merge: slice registers fold by MAX into the whole-corpus registers
    lo = hll_registers(df.filter(F.col("id") < 5000), ["grp"], "v")
    hi = hll_registers(df.filter(F.col("id") >= 5000), ["grp"], "v")
    merged = (
        lo.unionByName(hi)
        .groupBy("grp", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = hll_registers(df, ["grp"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    # partition invariance: same estimate at 1 and 32 partitions
    e1 = hll_distinct(df.coalesce(1), ["grp"], "v").collect()[0]["distinct_est"]
    e32 = hll_distinct(df.repartition(32), ["grp"], "v").collect()[0][
        "distinct_est"
    ]
    assert e1 == est["distinct_est"] == e32
