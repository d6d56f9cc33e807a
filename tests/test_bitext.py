"""Margin-based bitext mining (operators/bitext.py): Python-twin
parity of the margin core, the hub-suppression property that
motivates the ratio margin, and exact-vs-bucketed agreement on
well-separated clusters."""

from __future__ import annotations

import math

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.bitext import (
    BITEXT_K,
    COSQ_SCALE,
    MARGIN_SCALE,
    bitext_margin,
    bitext_mine,
    bitext_mine_ivf,
)


def _margin_py(pairs, k=BITEXT_K, mm=0):
    """Pure-Python twin of bitext_margin over (src, tgt, cos_q) rows."""
    from collections import defaultdict

    by_s, by_t = defaultdict(list), defaultdict(list)
    for s, t, c in pairs:
        by_s[s].append((t, c))
        by_t[t].append((s, c))
    frank = {}
    fsum = defaultdict(int)
    for s, lst in by_s.items():
        for r, (t, c) in enumerate(
            sorted(lst, key=lambda x: (-x[1], x[0])), 1
        ):
            frank[(s, t)] = r
            if r <= k:
                fsum[s] += c
    brank = {}
    bsum = defaultdict(int)
    for t, lst in by_t.items():
        for r, (s, c) in enumerate(
            sorted(lst, key=lambda x: (-x[1], x[0])), 1
        ):
            brank[(s, t)] = r
            if r <= k:
                bsum[t] += c
    best = {}
    for s, t, c in pairs:
        if frank[(s, t)] > k and brank[(s, t)] > k:
            continue
        m = (c * 2 * k * MARGIN_SCALE) // max(fsum[s] + bsum[t], 1)
        cur = best.get(s)
        if cur is None or (m, -t) > (cur[2], -cur[0]):
            best[s] = (t, c, m)
    return {
        s: v for s, v in best.items() if v[2] >= mm
    }


def test_margin_core_matches_python_twin(spark):
    pairs = [
        (0, 1, 900), (0, 3, 800), (0, 5, 700), (0, 7, 100),
        (2, 1, 950), (2, 3, 400), (4, 5, 600), (4, 1, 590),
        (6, 7, 990), (6, 1, 100), (6, 3, 90),
    ]
    df = spark.createDataFrame(
        pairs, "src_id bigint, tgt_id bigint, cos_q bigint"
    )
    got = {
        r["src_id"]: (r["tgt_id"], r["cos_x1e12"], r["margin_x1e6"])
        for r in bitext_margin(df, k=2, margin_min_x1e6=0).collect()
    }
    assert got == _margin_py(pairs, k=2, mm=0)


def _vec(angle: float, hub: float = 0.0) -> list[float]:
    # 3-dim: a unit vector at `angle` in the xy-plane plus a z "hub"
    # component shared by everything the hub should attract
    return [math.cos(angle), math.sin(angle), hub]


def test_ratio_margin_suppresses_hubs(spark):
    """src 0 is genuinely parallel to tgt 101 (same direction); the hub
    tgt 999 is moderately close to EVERY src. Plain cosine still picks
    the true pair here, but the margin GAP tells the story: hub pairs
    score 0.54 (the hub's neighborhood average equals its own cosine,
    so its denominator is fat) while true pairs score 1.065 — the
    default 1.05 threshold keeps every true pair and kills every hub
    pair."""
    srcs = [(i, _vec(0.25 * i)) for i in range(0, 6, 2)]
    tgts = [(101, _vec(0.0)), (103, _vec(0.5)), (105, _vec(1.0)),
            (999, [0.0, 0.0, 1.0])]
    # give every src a mild hub affinity
    srcs = [(i, [v[0], v[1], 0.35]) for i, v in srcs]
    src = spark.createDataFrame(srcs, "vec_id bigint, embedding array<float>")
    tgt = spark.createDataFrame(tgts, "vec_id bigint, embedding array<float>")
    rows = bitext_mine(src, tgt, k=2, margin_min_x1e6=1_050_000).collect()
    got = {r["src_id"]: r["tgt_id"] for r in rows}
    # mined pairs are the true directional matches, never the hub
    assert 999 not in got.values()
    assert got == {0: 101, 2: 103, 4: 105}
    # and the hub really was everyone's suitor: raw cosine to the hub is
    # positive for every src, yet no hub pair survives the margin gate
    import itertools

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    hub = [0.0, 0.0, 1.0]
    assert all(cos(v, hub) > 0.3 for _i, v in srcs)


def test_ivf_agrees_with_exact_on_separated_clusters(spark):
    """Two well-separated clusters: bucketing cannot change the k-NN
    neighborhoods, so the bucketed miner returns exactly the exact
    miner's pairs."""
    import itertools

    def cluster(base_id, direction, n):
        out = []
        for i in range(n):
            eps = 0.01 * i
            v = [direction[0] + eps, direction[1], direction[2]]
            out.append((base_id + i, v))
        return out

    a = cluster(0, [1.0, 0.0, 0.0], 6)
    b = cluster(100, [0.0, 1.0, 0.0], 6)
    allv = a + b
    src = spark.createDataFrame(
        [(i, v) for i, v in allv if i % 2 == 0],
        "vec_id bigint, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(i, v) for i, v in allv if i % 2 == 1],
        "vec_id bigint, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id bigint, centroid_vec array<float>",
    )
    exact = {
        (r["src_id"], r["tgt_id"], r["margin_x1e6"])
        for r in bitext_mine(src, tgt, k=2, margin_min_x1e6=0).collect()
    }
    bucketed = {
        (r["src_id"], r["tgt_id"], r["margin_x1e6"])
        for r in bitext_mine_ivf(
            src, tgt, cents, k=2, margin_min_x1e6=0
        ).collect()
    }
    assert exact and exact == bucketed
